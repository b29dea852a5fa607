"""On-device feature standardization (sklearn StandardScaler semantics).

Reference: extract_lsm_features.py:199-201 — fit on train only, transform
both splits. sklearn computes the population (ddof=0) std and maps zero
variance to scale 1.0; we match both. Under shard_map the moments are global
psum reductions over the sharded batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ScalerState(NamedTuple):
    mean: jax.Array   # (D,)
    scale: jax.Array  # (D,) std with zero-variance -> 1.0


def fit_scaler(x: jnp.ndarray) -> ScalerState:
    """(N, D) -> per-feature mean/scale.

    TWO-PASS (mean, then centered second moment): the one-pass
    E[x^2] - mean^2 form catastrophically cancels in f32 for
    large-mean / small-variance features — spike-time features sit at
    O(100) bin indices, where a true std of 0.01 came back as 0.125
    (12x) under the one-pass form. With the full matrix in hand the
    second pass is free; the moment-based paths (below) carry a shift
    for the same reason."""
    mean = jnp.mean(x, axis=0)
    d = x - mean[None, :]
    var = jnp.mean(d * d, axis=0)
    scale = jnp.sqrt(var)
    scale = jnp.where(scale == 0.0, 1.0, scale)
    return ScalerState(mean=mean, scale=scale)


def fit_scaler_from_moments(
    sum_x: jnp.ndarray,
    sum_x2: jnp.ndarray,
    count: jnp.ndarray,
    shift: jnp.ndarray | None = None,
) -> ScalerState:
    """Build scaler from (possibly psum-reduced) moments — the multi-chip
    and streaming paths, which cannot two-pass.

    With `shift` c, the moments are SHIFTED: sum_x = sum(x - c),
    sum_x2 = sum((x - c)^2). Then var = E[(x-c)^2] - (mean - c)^2
    subtracts a small correction instead of cancelling two large
    numbers (the standard shifted-data trick; pick c near the data,
    e.g. the first batch's mean). Without a shift this is the raw
    one-pass form — fine only when |mean| is O(std)."""
    if shift is None:
        mean = sum_x / count
        var = jnp.maximum(sum_x2 / count - mean * mean, 0.0)
    else:
        dmean = sum_x / count                       # mean - c
        mean = dmean + shift
        var = jnp.maximum(sum_x2 / count - dmean * dmean, 0.0)
    scale = jnp.sqrt(var)
    scale = jnp.where(scale == 0.0, 1.0, scale)
    return ScalerState(mean=mean, scale=scale)


def transform(state: ScalerState, x: jnp.ndarray) -> jnp.ndarray:
    return (x - state.mean) / state.scale
