"""Sharding tests on the virtual 8-device CPU mesh.

Validates: (a) pure-DP extraction equals single-device extraction exactly,
(b) the model-parallel (neuron-sharded) reservoir matches the dense
single-device reservoir, (c) the fused multi-chip training step compiles,
runs, and reduces the loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsm_tpu.config import FEATURE_SETS, ReservoirConfig
from lsm_tpu.models import reservoir as res
from lsm_tpu.parallel import mesh as meshlib
from lsm_tpu.parallel.sharded import (
    data_parallel_extract,
    extract_features_model_sharded,
)
from lsm_tpu.parallel.train_step import ReadoutState, make_train_step

KEYS = tuple(FEATURE_SETS["original"])


def _params(n=256, no=128, c=32, seed=0):
    cfg = ReservoirConfig(
        num_neurons=n, num_output_neurons=no, small_world_k=32,
        mean_weight=0.02, input_fanout=6, seed=seed,
    )
    return res.init_reservoir(cfg, n_channels=c)


def _spikes(rng, b=16, c=32, t=40):
    return (rng.random((b, c, t)) < 0.15).astype(np.uint8)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_data_parallel_matches_single_device(rng):
    params = _params()
    spikes = _spikes(rng)
    single = np.asarray(
        res.extract_features_batch(params, jnp.asarray(spikes), KEYS)
    )
    m = meshlib.make_mesh(n_data=8, n_model=1)
    sharded = np.asarray(
        data_parallel_extract(params, jnp.asarray(spikes), KEYS, m)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-5)


def test_model_parallel_matches_dense(rng):
    params = _params()
    spikes = _spikes(rng)
    # The sharded path runs f32 matmuls; compare against the dense f32 path
    # (the bf16 default rounds operands and spike dynamics diverge chaotically).
    dense = np.asarray(
        res.extract_features_batch(
            params, jnp.asarray(spikes), KEYS, matmul_dtype=None
        )
    )
    m = meshlib.make_mesh(n_data=2, n_model=4)
    tp = np.asarray(
        extract_features_model_sharded(params, jnp.asarray(spikes), KEYS, m)
    )
    assert tp.shape == dense.shape
    np.testing.assert_allclose(tp, dense, rtol=1e-4, atol=1e-4)


def test_model_parallel_10k_neuron_smoke(rng):
    """BASELINE.json configs[3]: the scaled 10k-neuron reservoir through
    the TENSOR-PARALLEL path on the 8-device mesh (short horizon — this
    validates sharded init/compile/run + finite well-formed features at
    scale, not throughput)."""
    cfg = ReservoirConfig(
        num_neurons=10_000, num_output_neurons=400,
        small_world_k=int(0.10 * 10_000 * 2), mean_weight=0.002,
    )
    params = res.init_reservoir(cfg, n_channels=128)
    assert params.w_rec.shape[0] >= 10_000
    spikes = _spikes(rng, b=8, c=128, t=24)
    m = meshlib.make_mesh(n_data=2, n_model=4)
    feats = np.asarray(
        extract_features_model_sharded(params, jnp.asarray(spikes), KEYS, m)
    )
    assert feats.shape == (8, len(KEYS) * 400)
    assert np.isfinite(feats).all()
    # The reservoir must actually fire (non-degenerate at this weight).
    assert feats[:, :400].sum() > 0  # spike_counts block


def test_train_step_runs_and_learns(rng):
    params = _params()
    m = meshlib.make_mesh(n_data=4, n_model=2)
    step = make_train_step(params, KEYS, num_classes=3, mesh=m, lr=0.5)

    spikes = _spikes(rng, b=24)
    # Labels correlated with input spike density so the step can learn.
    density = spikes.mean(axis=(1, 2))
    labels = np.digitize(density, np.quantile(density, [1 / 3, 2 / 3])).astype(
        np.int32
    )
    d = len(KEYS) * params.n_outputs
    state = ReadoutState(
        w=jnp.zeros((d, 3), jnp.float32), b=jnp.zeros((3,), jnp.float32)
    )
    loss0, state = step(jnp.asarray(spikes), jnp.asarray(labels), state)
    loss_prev = float(loss0)
    for _ in range(5):
        loss, state = step(jnp.asarray(spikes), jnp.asarray(labels), state)
    assert float(loss) < loss_prev, (float(loss), loss_prev)
    assert np.isfinite(float(loss))
