"""Numerical invariant checking (SURVEY.md section 5.2).

The reference is single-threaded NumPy and has nothing to race; its failure
mode is silent NaN propagation (it papers over NaNs with np.nan_to_num at
extract_lsm_features.py:85). Here, functional purity removes data races by
construction, and this module provides the sanitizer analogue for numerics:
`checkify`-wrapped variants of the stage functions that turn NaN/Inf and
invariant violations into hard, located errors. Wired into production via
the CLI `--check` flag (PipelineConfig.check): featurization and the
reservoir simulation run under `checked`, and stage outputs are validated
host-side (pipeline._check_spikes_host / _check_features_host). Costs a
pass over the data; the default paths stay unchecked.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable) -> Callable:
    """Wrap a stage function with float checks; returns (err, out) semantics
    collapsed into raise-on-error. The checkify transform is built ONCE —
    rebuilding it per call would re-trace the checked stage every batch."""
    f = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = f(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(name: str, x: jnp.ndarray) -> None:
    """In-graph finiteness check (debug builds / tests)."""
    checkify.check(
        jnp.all(jnp.isfinite(x)), f"{name} contains non-finite values"
    )


def assert_spike_invariants(spikes: jnp.ndarray) -> None:
    """Spike trains must be binary uint8."""
    checkify.check(
        jnp.all((spikes == 0) | (spikes == 1)),
        "spike train values must be 0/1",
    )


def validate_features_host(features) -> Tuple[bool, str]:
    """Host-side post-hoc validation behind the CLI --check flag
    (pipeline._check_features_host raises on a False verdict)."""
    import numpy as np

    f = np.asarray(features)
    if not np.isfinite(f).all():
        n = int((~np.isfinite(f)).sum())
        return False, f"{n} non-finite feature values"
    if f.std() == 0.0:
        return False, "features are constant — reservoir produced no activity"
    return True, "ok"
