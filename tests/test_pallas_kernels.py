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


def test_gtgram_chunk_two_phase_matches_scan_interpret(rng):
    """Streaming two-phase chunk featurizer (carried state) vs the XLA
    chunk scan: sub-block energies within the batch kernel's tolerance,
    and chunking with threaded state exact for the two-phase path itself
    (same step math regardless of chunk boundaries)."""
    import numpy as np

    from lsm_tpu.ops import gammatone as gt

    fs, C, f_min, g = 16000.0, 128, 50.0, 80
    B, L = 8, 1600                        # n_sub = 20 (% _CHUNK == 0)
    wave = (rng.standard_normal((B, 2 * L)) * 0.2).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        st = jnp.zeros((B, 8, C), jnp.float32)
        outs = []
        for k in range(2):
            st, sub_e = gk.gtgram_chunk_two_phase(
                jnp.asarray(wave[:, k * L:(k + 1) * L]), st, fs, C, f_min, g
            )
            outs.append(np.asarray(sub_e))
        two_phase = np.concatenate(outs, axis=0)      # (2*n_sub, B, C)

        # Whole-signal two-phase call: chunking must be EXACT.
        st0 = jnp.zeros((B, 8, C), jnp.float32)
        _, whole = gk.gtgram_chunk_two_phase(
            jnp.asarray(wave), st0, fs, C, f_min, g
        )
        np.testing.assert_array_equal(two_phase, np.asarray(whole))

    # XLA chunk scan on the same signal: tolerance oracle (the two paths
    # compute identical math reorganized; same class as the batch kernel).
    blocks = wave.reshape(B, -1, g).transpose(1, 0, 2)
    _, scan_e = gt.gtgram_iir_scan(
        jnp.asarray(blocks), jnp.zeros((B, 8, C), jnp.float32),
        fs, C, f_min, g,
    )
    scan_e = np.asarray(scan_e)
    denom = np.maximum(np.abs(scan_e), 1e-3)
    rel = np.abs(two_phase - scan_e) / denom
    assert np.quantile(rel, 0.99) < 5e-3, np.quantile(rel, 0.99)


def test_gtgram_chunk_two_phase_batch_padding(rng):
    """The internal batch pad to the lane tile must not change results:
    a 3-stream call equals the first 3 rows of a 128-stream call whose
    first 3 streams carry the same audio."""
    import numpy as np

    fs, C, f_min, g = 16000.0, 32, 50.0, 80
    L = 320                                # n_sub = 4
    wave = (rng.standard_normal((128, L)) * 0.2).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        st_small = jnp.zeros((3, 8, C), jnp.float32)
        st_full = jnp.zeros((128, 8, C), jnp.float32)
        s1, e1 = gk.gtgram_chunk_two_phase(
            jnp.asarray(wave[:3]), st_small, fs, C, f_min, g
        )
        s2, e2 = gk.gtgram_chunk_two_phase(
            jnp.asarray(wave), st_full, fs, C, f_min, g
        )
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2)[:, :3])
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2)[:3])
