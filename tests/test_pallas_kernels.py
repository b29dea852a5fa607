"""Pallas kernel tests (interpret mode on CPU).

The experimental gtgram kernel must stay numerically equal to the XLA
block-IIR path where it is validated (interpret mode); hardware behavior is
exercised separately on TPU runs.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lsm_tpu.ops import gammatone as gt
from lsm_tpu.ops.pallas import gtgram_kernel as gk


def test_pallas_gtgram_matches_xla_interpret(rng):
    wave = (rng.standard_normal((4, 16000)) * 0.2).astype(np.float32)
    ref = np.asarray(
        gt.gtgram_iir(jnp.asarray(wave), 16000.0, 0.025, 0.01, 128, 50.0)
    )
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            gk.gtgram_pallas(jnp.asarray(wave), 16000.0, 0.025, 0.01, 128, 50.0)
        )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=5e-3, atol=1e-6)


def test_pallas_supported_geometry():
    assert gk.pallas_supported(16000.0, 0.025, 0.01, 128, 16000)
    assert not gk.pallas_supported(16000.0, 0.025, 0.01, 100, 16000)
