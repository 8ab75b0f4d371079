"""DTW parameter record.

Mirrors the semantics of the reference ``DTWSettings``
(/root/reference/src/dtaidistance/dtw.py:104-263) without copying its
implementation: a small record of DTW knobs plus the cost-space
("adjusted") representations used by the dynamic program.

The record is tiny and pickles cheaply, so it is broadcast by closure
capture into Ray ``map_batches`` functions and actor constructors, and
serialized into checkpoint manifests (the analogue of the reference's
``DTWSettings.to_h5_group``, dtw.py:245-256).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple, Union

INF = float("inf")

SQEUCLIDEAN = "squared euclidean"
EUCLIDEAN = "euclidean"


def is_custom_inner(inner_dist) -> bool:
    """CustomInnerDist-style object: has inner_dist/result/inner_val
    (reference innerdistance.py:130-163 extension surface)."""
    return hasattr(inner_dist, "inner_dist") and hasattr(inner_dist, "result")


def _inner_val(inner_dist, x: float) -> float:
    """Distance-space -> cost-space (reference innerdistance.py:55-128)."""
    if is_custom_inner(inner_dist):
        return inner_dist.inner_val(x)
    if inner_dist == SQEUCLIDEAN:
        return x * x
    return x


def _result(inner_dist, x):
    """Cost-space -> distance-space."""
    if is_custom_inner(inner_dist):
        return inner_dist.result(x)
    if inner_dist == SQEUCLIDEAN:
        import numpy as np

        if isinstance(x, np.ndarray):
            return np.sqrt(x)
        return math.sqrt(x)
    return x


@dataclass
class DTWSettings:
    """DTW knobs, semantics identical to the reference.

    window      Sakoe-Chiba band half-width; None/0 = unconstrained.
    max_dist    early-abandon threshold in distance space.
    max_step    per-point cost cap in distance space.
    max_length_diff  return inf when series lengths differ by more.
    penalty     additive penalty for non-diagonal steps (distance space).
    psi         int or 4-tuple (b1, e1, b2, e2) begin/end relaxation.
    use_pruning set max_dist to ub_euclidean (PrunedDTW regime).
    inner_dist  'squared euclidean' (default) or 'euclidean'.
    """

    window: Optional[int] = None
    use_pruning: bool = False
    max_dist: Optional[float] = None
    max_step: Optional[float] = None
    max_length_diff: Optional[int] = None
    penalty: Optional[float] = None
    psi: Union[None, int, Tuple[int, int, int, int]] = None
    # 'squared euclidean', 'euclidean', or a CustomInnerDist-style
    # object with inner_dist/result/inner_val static methods
    inner_dist: Union[str, object] = SQEUCLIDEAN

    # -- cost-space views -------------------------------------------------
    @property
    def adj_max_step(self) -> float:
        if not self.max_step:
            return INF
        return _inner_val(self.inner_dist, self.max_step)

    @property
    def adj_max_dist(self) -> float:
        if not self.max_dist:
            return INF
        return _inner_val(self.inner_dist, self.max_dist)

    @property
    def adj_penalty(self) -> float:
        if not self.penalty:
            return 0.0
        return _inner_val(self.inner_dist, self.penalty)

    @property
    def adj_max_length_diff(self) -> float:
        if self.max_length_diff is None:
            return INF
        return self.max_length_diff

    def split_psi(self) -> Tuple[int, int, int, int]:
        if isinstance(self.psi, int):
            return self.psi, self.psi, self.psi, self.psi
        if isinstance(self.psi, (tuple, list)):
            b1, e1, b2, e2 = self.psi
            return b1, e1, b2, e2
        return 0, 0, 0, 0

    def effective_window(self, r: int, c: int) -> int:
        if self.window is None or self.window == 0:
            return max(r, c)
        return self.window

    def result(self, x):
        return _result(self.inner_dist, x)

    def inner_val(self, x):
        return _inner_val(self.inner_dist, x)

    def kwargs(self) -> dict:
        return {
            "window": self.window,
            "use_pruning": self.use_pruning,
            "max_dist": self.max_dist,
            "max_step": self.max_step,
            "max_length_diff": self.max_length_diff,
            "penalty": self.penalty,
            "psi": self.psi,
            "inner_dist": self.inner_dist,
        }

    def manifest_dict(self) -> dict:
        """JSON-serializable form for checkpoint manifests."""
        d = self.kwargs()
        if isinstance(d["psi"], tuple):
            d["psi"] = list(d["psi"])
        if not isinstance(d["inner_dist"], str):
            # CustomInnerDist-style objects are documented settings but
            # not JSON-serializable; identify them by class (plus repr,
            # which custom dists may parameterize) so settings_hash —
            # called at checkpoint-manifest time — works instead of
            # raising TypeError (round-5 review finding)
            obj = d["inner_dist"]
            # default object.__repr__ embeds the memory address — not
            # stable across processes, which would break resume
            # fingerprints; use it only when the class customizes repr
            rep = repr(obj) if type(obj).__repr__ is not object.__repr__ else ""
            d["inner_dist"] = f"custom:{type(obj).__qualname__}:{rep}"
        return d

    def settings_hash(self) -> str:
        import hashlib
        import json

        return hashlib.sha256(
            json.dumps(self.manifest_dict(), sort_keys=True).encode()
        ).hexdigest()[:16]
