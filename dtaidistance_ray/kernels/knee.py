"""EWMA-based knee detection for monotone-ish score curves.

Used as a stopping criterion when consuming matches best-first: stop
when the next value jumps above the exponentially-weighted moving
average by more than ``arrvar_fraction`` running deviations (the knee
of the curve). Semantics follow the reference ``util.DetectKnee``
(study-only, no code copied: /root/reference/src/dtaidistance/
util.py:373-455), which is itself based on the published PLUSH EWMA
criterion (Annapureddy et al., USENIX '06).

State update per value v (after the stop check):
    arrvar <- alpha * max(0, v - arr) + (1 - alpha) * arrvar
    arr    <- alpha * v + (1 - alpha) * arr
Stop when  cnt >= min_points  and  v > thr_value  and
           v > arr + arrvar_fraction * arrvar.
``only_var`` updates shrink the deviation estimate without moving the
average (used when a value was observed but not consumed). ``invert``
flips a decreasing curve into the increasing frame by measuring the
drop from the first value.
"""

from __future__ import annotations


class DetectKnee:
    def __init__(self, alpha: float = 0.3, invert: bool = False,
                 alpha_onlyvar: float = 0.0, thr_value=None):
        self.cnt = 0
        self.cnt_onlyvar = 0
        self.min_points = 3
        self.thr_value = thr_value if thr_value is not None else 0
        self.arrvar_fraction = 4
        self.alpha = alpha
        self.alpha_onlyvar = alpha_onlyvar
        self.arr = None
        self.arrvar = None
        self.max_thr = None
        self.invert = invert
        self.invert_value = None

    def dostop(self, value, only_var: bool = False) -> bool:
        """Feed the next curve value; True once the knee is reached.

        The first value only initialises the state (never stops)."""
        if self.arr is None:
            if self.invert:
                self.invert_value = value
                self.thr_value = value - self.thr_value
                value = 0
            self.arr = value
            self.arrvar = 0
            return False
        if self.invert:
            value = self.invert_value - value
        stop = False
        self.max_thr = self.arr + self.arrvar_fraction * self.arrvar
        if self.cnt >= self.min_points and value > self.thr_value and value > self.max_thr:
            stop = True
        if only_var:
            self.arrvar = (1.0 - self.alpha_onlyvar) * self.arrvar
            self.cnt_onlyvar += 1
        else:
            self.arrvar = self.alpha * max(0, value - self.arr) + (1.0 - self.alpha) * self.arrvar
            self.arr = self.alpha * value + (1.0 - self.alpha) * self.arr
            self.cnt += 1
        return stop
