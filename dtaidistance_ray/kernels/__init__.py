"""Pure NumPy per-pair / per-group kernels (no Ray dependencies).

Ray stages in dtaidistance_ray.stages call these inside map_batches /
map_groups; keeping them Ray-free makes them unit-testable against the
reference library directly.
"""

from .elastic import (  # noqa: F401
    best_path,
    best_path_prob,
    distance,
    lb_keogh,
    srand,
    ub_euclidean,
    warp,
    warping_amount,
    warping_path,
    warping_path_penalty,
    warping_path_prob,
    warping_paths,
)
from .dba import dba, dba_finalize, dba_loop, dba_merge, dba_partial  # noqa: F401
