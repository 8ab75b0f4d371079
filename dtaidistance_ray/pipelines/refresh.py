"""Incremental continuous-aggregate refresh for the tier-0 rollup.

North-rule semantics: when new token rows arrive, the continuous
aggregate must be brought up to date WITHOUT recomputing history.
Scalar sums would merge associatively, but the DBA representative is a
barycenter over a bucket's members and does not merge incrementally —
so the refresh unit is the (source, bucket) GROUP: groups touched by
the delta are recomputed from the combined input (cost proportional to
the dirty fraction), untouched groups pass through byte-identical. The
result is bit-equal to a full rerun (asserted in tests) because the
tier-0 scan itself is partition-order independent.

Scale shape: the dirty-key set is bounded by the delta's key-space
(source x touched hour), broadcast once via ray.put; both the
combined-input filter and the pass-through filter are vectorized
per-batch sorted-array membership tests (np.isin per distinct source),
zero-copy pyarrow in and out. Nothing rescans clean history: at 100 TB
an hourly delta dirties a vanishing fraction of (source, bucket)
groups and the recompute scan reads only those rows.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.rollup import RollupConfig, bucketize
from ..stages.rollup_scan import scan_rollup_base_tier
from ..stages.pool import auto_pool


def dirty_keys(delta_ds, cfg: RollupConfig, spec=None) -> pd.DataFrame:
    """Distinct (source, bucket) groups the delta touches — per-block
    distinct inside map_batches, final dedup over the bounded union."""
    b = bucketize(delta_ds, cfg.tier_widths[0], spec)

    def distinct(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pylist(),
                "bucket": batch["bucket"].to_numpy(zero_copy_only=False),
            }
        )
        return df.drop_duplicates()

    out = b.map_batches(distinct, batch_format="pyarrow").to_pandas().drop_duplicates()
    out["bucket"] = out["bucket"].astype("int64")
    return out.reset_index(drop=True)


class _DirtyFilter:
    """Keep (or drop) rows whose (source, bucket) is in the broadcast
    dirty set; sorted-array membership per distinct source."""

    def __init__(self, ref, keep_dirty: bool):
        import ray

        dk = ray.get(ref)
        self.by_src = {
            s: np.sort(g["bucket"].to_numpy(np.int64))
            for s, g in dk.groupby("source")
        }
        self.keep = keep_dirty

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        bucket = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.zeros(len(bucket), dtype=bool)
        for s in pd.unique(src):
            arr = self.by_src.get(s)
            if arr is None or not len(arr):
                continue
            m = src == s
            idx = np.searchsorted(arr, bucket[m])
            idx[idx == len(arr)] = 0
            mask[m] = arr[idx] == bucket[m]
        if not self.keep:
            mask = ~mask
        return batch.filter(pa.array(mask))


def refresh_tier0(
    existing_tier0,
    combined_ds,
    delta_ds,
    cfg: Optional[RollupConfig] = None,
    spec=None,
) -> Tuple[object, pd.DataFrame]:
    """Refresh an existing tier-0 rollup with newly-arrived rows.

    existing_tier0: Ray Dataset of current tier-0 rows (TIER_SCHEMA_COLS).
    combined_ds:    the full raw input INCLUDING the delta (a dirty
                    bucket's members span old and new rows, so its
                    exact recompute needs both).
    delta_ds:       just the newly-arrived raw rows.

    Returns (refreshed tier-0 Dataset, dirty-key DataFrame). Bit-equal
    to scan_rollup_base_tier over the combined input.
    """
    import ray

    cfg = cfg or RollupConfig()
    dk = dirty_keys(delta_ds, cfg, spec)
    ref = ray.put(dk)

    dirty_rows = bucketize(combined_ds, cfg.tier_widths[0], spec).map_batches(
        _DirtyFilter,
        fn_constructor_args=(ref, True),
        batch_format="pyarrow",
        concurrency=auto_pool(),
    )
    recomputed = scan_rollup_base_tier(dirty_rows, cfg)
    kept = existing_tier0.map_batches(
        _DirtyFilter,
        fn_constructor_args=(ref, False),
        batch_format="pyarrow",
        concurrency=auto_pool(),
    )
    return kept.union(recomputed), dk
