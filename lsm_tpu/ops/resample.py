"""Linear time-axis resampling matching scipy.ndimage.zoom(order=1).

The reference resamples spectrograms to exactly TIME_BINS=100 columns via
`zoom(spec, (1, TIME_BINS / n_cols), order=1)` (create_dataset.py:69-78).

scipy.ndimage.zoom with grid_mode=False (the default) maps output index i to
input coordinate i * (in_size - 1) / (out_size - 1), i.e. endpoints map to
endpoints. Since both sizes are static under jit, the interpolation reduces
to two static gathers and a lerp — fully vectorized, no scan.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _lerp_plan(in_size: int, out_size: int):
    if out_size == 1 or in_size == 1:
        lo = np.zeros(out_size, dtype=np.int32)
        return lo, lo, np.zeros(out_size, dtype=np.float32)
    x = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(x).astype(np.int64)
    lo = np.minimum(lo, in_size - 2)
    frac = (x - lo).astype(np.float32)
    return lo.astype(np.int32), (lo + 1).astype(np.int32), frac


def zoom_time_axis(spec: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """(.., T_in) -> (.., out_size) linear interpolation along the last axis."""
    in_size = spec.shape[-1]
    if in_size == out_size:
        return spec
    lo, hi, frac = _lerp_plan(in_size, out_size)
    a = spec[..., lo]
    b = spec[..., hi]
    return a + (b - a) * jnp.asarray(frac)
