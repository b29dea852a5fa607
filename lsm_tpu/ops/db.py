"""dB conversion utilities matching the reference's two code paths.

- mel path: librosa.power_to_db(S, ref=np.max) with defaults amin=1e-10,
  top_db=80 (create_dataset.py:48).
- gammatone path: 20*log10(S + 1e-9) followed by an explicit floor at
  max - 80 dB (create_dataset.py:59-60).

Both are per-sample operations: `ref=np.max` and the floor are computed over
each individual spectrogram, so the batched versions reduce over the last
two axes only.
"""

from __future__ import annotations

import jax.numpy as jnp

_LOG10 = 2.302585092994046  # ln(10)


def _log10(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x) / _LOG10


def power_to_db(
    power: jnp.ndarray, amin: float = 1e-10, top_db: float = 80.0
) -> jnp.ndarray:
    """librosa.power_to_db(S, ref=np.max) over the trailing 2 axes."""
    ref = jnp.max(power, axis=(-2, -1), keepdims=True)
    log_spec = 10.0 * _log10(jnp.maximum(power, amin))
    log_spec = log_spec - 10.0 * _log10(jnp.maximum(ref, amin))
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    return jnp.maximum(log_spec, peak - top_db)


def amplitude_to_db_floor(
    amplitude: jnp.ndarray, eps: float = 1e-9, top_db: float = 80.0
) -> jnp.ndarray:
    """Reference gammatone path: 20*log10(S + eps), floored at max - top_db."""
    spec_db = 20.0 * _log10(amplitude + eps)
    peak = jnp.max(spec_db, axis=(-2, -1), keepdims=True)
    return jnp.maximum(spec_db, peak - top_db)


def minmax_normalize(
    spec_db: jnp.ndarray, degenerate_eps: float = 1e-8
) -> jnp.ndarray:
    """Per-sample min-max to [0, 1]; degenerate dynamic range -> zeros.

    Matches create_dataset.py:62-67: if (max - min) < 1e-8 the sample becomes
    all zeros, otherwise (x - min) / (max - min + 1e-8).
    """
    lo = jnp.min(spec_db, axis=(-2, -1), keepdims=True)
    hi = jnp.max(spec_db, axis=(-2, -1), keepdims=True)
    rng = hi - lo
    normed = (spec_db - lo) / (rng + degenerate_eps)
    return jnp.where(rng < degenerate_eps, jnp.zeros_like(normed), normed)
