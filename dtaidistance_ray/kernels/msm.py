"""Move-Split-Merge metric (Stefan, Athitsos & Das, TKDE 2012) —
reference msm.py:19-57 semantics, including its (documented) use of
(n, m) loop bounds over the cost matrix."""

from __future__ import annotations

import numpy as np


def distance(x, y, sm_cost: float = 0.1) -> float:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)

    def c(a, b, cc):
        if (b <= a <= cc) or (b >= a >= cc):
            return sm_cost
        return sm_cost + min(abs(a - b), abs(a - cc))

    m = len(x)
    n = len(y)
    cost = np.zeros((m, n))
    cost[0, 0] = abs(x[0] - y[0])
    for i in range(1, m):
        cost[i, 0] = cost[i - 1, 0] + c(x[i], x[i - 1], y[0])
    for j in range(1, n):
        cost[0, j] = cost[0, j - 1] + c(y[j], x[0], y[j - 1])
    # NOTE the reference iterates i over range(1, n) and j over
    # range(1, m) (msm.py:48-55); replicated for exact parity. For
    # equal-length series (the only case the reference supports) this
    # is the full matrix; for UNEQUAL lengths the swapped bounds read
    # x[i] with i up to n-1 (or y[j] up to m-1) and raise IndexError —
    # in the reference exactly as here (round-5 review clarified the
    # consequence: every unequal-length call crashes, not merely a
    # partial matrix).
    for i in range(1, n):
        for j in range(1, m):
            cost[i, j] = min(
                cost[i - 1][j - 1] + abs(x[i] - y[j]),
                cost[i - 1][j] + c(x[i], x[i - 1], y[j]),
                cost[i][j - 1] + c(y[j], x[i], y[j - 1]),
            )
    return float(cost[m - 1, n - 1])
