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


def test_pallas_lif_matches_xla_interpret(rng):
    from lsm_tpu.config import FEATURE_SETS, ReservoirConfig
    from lsm_tpu.models import reservoir as res
    from lsm_tpu.ops.pallas.lif_kernel import simulate_batch_pallas

    cfg = ReservoirConfig(
        num_neurons=256, num_output_neurons=128, small_world_k=32,
        mean_weight=0.02, input_fanout=6,
    )
    params = res.init_reservoir(cfg, n_channels=32)
    spikes = jnp.asarray((rng.random((8, 32, 40)) < 0.15).astype(np.uint8))
    keys = tuple(FEATURE_SETS["all"])
    ref = res.features_from_stats(
        res.simulate_batch(params, spikes, matmul_dtype=jnp.bfloat16), keys
    )
    with pltpu.force_tpu_interpret_mode():
        out = res.features_from_stats(simulate_batch_pallas(params, spikes), keys)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pallas_lif_window_clamp_non_divisible_t(rng):
    """T not a multiple of n_rate_windows: the XLA path clamps overflow
    steps into the LAST window (min(t // win_len, n_win - 1)); the kernel
    must produce the same spike_variances, not open an 11th window."""
    from lsm_tpu.config import FEATURE_SETS, ReservoirConfig
    from lsm_tpu.models import reservoir as res
    from lsm_tpu.ops.pallas.lif_kernel import simulate_batch_pallas

    cfg = ReservoirConfig(
        num_neurons=256, num_output_neurons=128, small_world_k=32,
        mean_weight=0.02, input_fanout=6,
    )
    params = res.init_reservoir(cfg, n_channels=32)
    spikes = jnp.asarray((rng.random((4, 32, 45)) < 0.2).astype(np.uint8))
    keys = tuple(FEATURE_SETS["all"])
    ref = res.features_from_stats(
        res.simulate_batch(params, spikes, matmul_dtype=jnp.bfloat16), keys
    )
    with pltpu.force_tpu_interpret_mode():
        out = res.features_from_stats(simulate_batch_pallas(params, spikes), keys)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
