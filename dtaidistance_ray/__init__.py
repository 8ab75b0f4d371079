"""dtaidistance_ray — Ray-Data-native time-series rollup/downsample engine.

A from-scratch engine with the query and data-processing capabilities of
wannesm/dtaidistance, re-expressed as ray.data.Dataset pipelines:
map_batches over zero-copy Arrow batches, actor pools for stateful
stages (warm DTW buffers, Gorilla encoder state), explicit
groupby/sort/repartition shuffles keyed by (source, time-bucket).

Layout:
  kernels/    pure NumPy per-pair and per-group kernels (DTW, LB, DBA, ...)
  codec/      Gorilla XOR + delta-of-delta encoders
  stages/     Ray Data stage builders (bucketize, rollup, distance matrix, ...)
  sources/    deterministic synthetic token-table source, parquet IO
  pipelines/  end-to-end pipelines (flagship rollup+downsample+retention)
  state/      checkpoint manifests, lineage, resume
"""

from .settings import DTWSettings  # noqa: F401

__version__ = "0.1.0"
