"""sktime / sklearn connector (reference connectors/sktime.py:17-39).

sktime passes series as (n, 1) column vectors; our kernels expect flat
rows. These adapters make the engine's DTW usable as a plug-in metric
for KNeighborsTimeSeriesClassifier-style estimators:

    from dtaidistance_ray.connectors.sktime import dtw_distance
    KNeighborsTimeSeriesClassifier(distance=dtw_distance)

Neither sktime nor sklearn is imported here — the contract is purely
the callable signature, so the connector works (and is tested) without
either package installed.
"""

from __future__ import annotations

import numpy as np

from ..kernels.elastic import distance
from ..settings import DTWSettings


def dtw_distance(x: np.ndarray, y: np.ndarray, dtw_settings=None, **kwargs) -> float:
    """sklearn-compatible metric: accepts (n, 1) column series."""
    if dtw_settings is None:
        dtw_settings = {}
    x = np.asarray(x)
    y = np.asarray(y)
    if x.ndim > 1:
        x = x[:, 0]
    if y.ndim > 1:
        y = y[:, 0]
    if isinstance(dtw_settings, DTWSettings):
        return distance(x, y, dtw_settings)
    return distance(x, y, DTWSettings(**dtw_settings))


def dtw_distance_create(**dtw_settings):
    """Bind settings once; returns a metric callable for estimators."""

    def dtw_distance_fn(x, y, **kwargs):
        return dtw_distance(x, y, dtw_settings, **kwargs)

    return dtw_distance_fn
