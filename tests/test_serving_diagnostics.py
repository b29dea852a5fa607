"""Live serving diagnostics (engines' .diagnostics() + StreamPool):
the serving analogue of run_network_diagnostics. The exact engine's
counts must equal re-simulating its trailing window (full-reservoir
scope); the continuous engine's must equal the window sum of its own
segment ring (output-neuron scope); the pool restricts the verdict to
connected sessions."""

import numpy as np
import pytest
import jax.numpy as jnp

from lsm_tpu.config import FrontendConfig, ReservoirConfig
from lsm_tpu.models import reservoir as res
from lsm_tpu.models.continuous import ContinuousKWS
from lsm_tpu.models.diagnostics import (
    EDGE_OF_CHAOS, SUB_CRITICAL, SUPER_CRITICAL, classify_regime,
    serving_report,
)
from lsm_tpu.models.frontend import featurize_batch
from lsm_tpu.models.pool import StreamPool
from lsm_tpu.models.streaming import StreamingKWS
from lsm_tpu.readout import logistic, scaler

L = 1600


@pytest.fixture(scope="module")
def setup():
    fcfg = FrontendConfig(n_filters=16, filterbank="gammatone")
    rcfg = ReservoirConfig(
        num_neurons=128, num_output_neurons=64, small_world_k=16,
        mean_weight=0.03,
    )
    params = res.init_reservoir(rcfg, n_channels=16)
    d = 5 * 64
    r = np.random.default_rng(0)
    readout = logistic.LogisticParams(
        w=jnp.asarray(r.normal(0, 0.1, (d, 4)).astype(np.float32)),
        b=jnp.zeros((4,), jnp.float32),
    )
    st = scaler.ScalerState(
        mean=jnp.zeros((d,), jnp.float32), scale=jnp.ones((d,), jnp.float32)
    )
    return params, readout, st, fcfg


def test_exact_engine_full_reservoir_oracle(setup, rng):
    params, readout, st, fcfg = setup
    kws = StreamingKWS(params, readout, st, fcfg, "original", 3)
    for _ in range(4):
        kws.step((rng.standard_normal((3, L)) * 0.3).astype(np.float32))

    rep = kws.diagnostics()
    assert rep.scope == "full" and rep.n_neurons == params.n_neurons

    # Oracle: re-simulate the engine's own trailing window.
    spikes = featurize_batch(jnp.asarray(kws.buffer), fcfg)
    counts = np.asarray(res.simulate_batch(params, spikes)["all_counts"])
    active = (counts > 0).sum(axis=1)
    np.testing.assert_allclose(
        rep.participation, active / params.n_neurons * 100.0
    )
    np.testing.assert_array_equal(rep.dead_neurons,
                                  params.n_neurons - active)
    np.testing.assert_allclose(
        rep.spikes_per_neuron, counts.sum(axis=1) / params.n_neurons
    )
    assert rep.regime == classify_regime(rep.avg_participation)[0]
    assert "STATUS:" in rep.render()

    # stream_idx restricts the verdict's average to the selected rows.
    sub = kws.diagnostics(stream_idx=[2, 0])
    np.testing.assert_array_equal(sub.stream_idx, [2, 0])
    np.testing.assert_allclose(sub.participation, rep.participation[[2, 0]])
    assert sub.avg_participation == pytest.approx(
        rep.participation[[2, 0]].mean()
    )


def test_exact_engine_silent_is_subcritical(setup):
    params, readout, st, fcfg = setup
    kws = StreamingKWS(params, readout, st, fcfg, "original", 2)
    rep = kws.diagnostics()            # zero buffer: no input, no spikes
    assert rep.avg_participation == 0.0
    assert rep.regime == SUB_CRITICAL
    assert "INCREASE multiplier" in rep.advice


def test_continuous_engine_ring_oracle(setup, rng):
    params, readout, st, fcfg = setup
    kws = ContinuousKWS(params, readout, st, fcfg, "original", 2,
                        chunk_len=L)
    for _ in range(3):
        kws.step((rng.standard_normal((2, L)) * 0.3).astype(np.float32))

    rep = kws.diagnostics()
    assert rep.scope == "output" and rep.n_neurons == params.n_outputs

    # Oracle: the engine's own segment ring, summed over the window.
    counts = np.asarray(kws.snapshot()["seg:counts"]).sum(axis=0)  # (B, no)
    active = (counts > 0).sum(axis=1)
    np.testing.assert_allclose(
        rep.participation, active / params.n_outputs * 100.0
    )
    np.testing.assert_allclose(
        rep.spikes_per_neuron, counts.sum(axis=1) / params.n_outputs
    )


def test_mesh_engines_match_single_device(setup, rng):
    from lsm_tpu.parallel.mesh import make_mesh

    params, readout, st, fcfg = setup
    mesh = make_mesh(n_data=4, n_model=1)
    audio = (rng.standard_normal((3, 4, L)) * 0.3).astype(np.float32)

    for cls, kwargs in (
        (StreamingKWS, {}),
        (ContinuousKWS, {"chunk_len": L}),
    ):
        one = cls(params, readout, st, fcfg, "original", 4, **kwargs)
        sharded = cls(params, readout, st, fcfg, "original", 4,
                      mesh=mesh, **kwargs)
        for hop in range(3):
            one.step(audio[hop])
            sharded.step(audio[hop])
        a, b = one.diagnostics(), sharded.diagnostics()
        np.testing.assert_allclose(a.participation, b.participation)
        np.testing.assert_allclose(a.spikes_per_neuron, b.spikes_per_neuron)
        assert a.regime == b.regime


def test_pool_diagnostics_connected_only(setup, rng):
    params, readout, st, fcfg = setup
    pool = StreamPool(
        ContinuousKWS(params, readout, st, fcfg, "original", 4, chunk_len=L)
    )
    with pytest.raises(ValueError, match="zero streams"):
        pool.diagnostics()             # empty pool: nothing to diagnose

    a = pool.admit("a")
    b = pool.admit("b")
    for _ in range(2):
        pool.step({
            "a": (rng.standard_normal(L) * 0.3).astype(np.float32),
            "b": (rng.standard_normal(L) * 0.3).astype(np.float32),
        })
    rep, per = pool.diagnostics()
    assert set(per) == {"a", "b"}
    np.testing.assert_array_equal(sorted(rep.stream_idx), sorted([a, b]))
    full = pool.kws.diagnostics()      # free slots included -> all 4 rows
    assert len(full.stream_idx) == 4
    # Connected rows agree with the engine-wide report's same slots.
    for s, slot in (("a", a), ("b", b)):
        assert per[s][0] == pytest.approx(full.participation[slot])


def test_serving_report_thresholds():
    # Fabricated counts around the reference thresholds (40% / 98%).
    n = 100
    rep = serving_report(np.array([39, 39]), np.array([50.0, 50.0]), n,
                         "full")
    assert rep.regime == SUB_CRITICAL
    rep = serving_report(np.array([99, 99]), np.array([500.0, 500.0]), n,
                         "full")
    assert rep.regime == SUPER_CRITICAL
    rep = serving_report(np.array([85, 90]), np.array([100.0, 90.0]), n,
                         "full")
    assert rep.regime == EDGE_OF_CHAOS
    with pytest.raises(ValueError, match="zero streams"):
        serving_report(np.array([1]), np.array([1.0]), n, "full",
                       stream_idx=[])
