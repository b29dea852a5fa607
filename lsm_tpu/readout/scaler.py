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
    """(N, D) -> per-feature mean/scale."""
    mean = jnp.mean(x, axis=0)
    var = jnp.mean(x * x, axis=0) - mean * mean
    var = jnp.maximum(var, 0.0)
    scale = jnp.sqrt(var)
    scale = jnp.where(scale == 0.0, 1.0, scale)
    return ScalerState(mean=mean, scale=scale)


def fit_scaler_from_moments(
    sum_x: jnp.ndarray, sum_x2: jnp.ndarray, count: jnp.ndarray
) -> ScalerState:
    """Build scaler from (possibly psum-reduced) moments — the multi-chip path."""
    mean = sum_x / count
    var = jnp.maximum(sum_x2 / count - mean * mean, 0.0)
    scale = jnp.sqrt(var)
    scale = jnp.where(scale == 0.0, 1.0, scale)
    return ScalerState(mean=mean, scale=scale)


def transform(state: ScalerState, x: jnp.ndarray) -> jnp.ndarray:
    return (x - state.mean) / state.scale
