"""Partial-activity ingest (step_active): sending only the active
streams' rows must be BIT-equal to the full wire chunk with silence in
the inactive rows — for every wire format, both engines, and under a
mesh — while the state advance stays identical (silent streams keep
evolving on silence)."""

import numpy as np
import pytest

from lsm_tpu.config import FrontendConfig, ReservoirConfig
from lsm_tpu.models import reservoir as res
from lsm_tpu.models.continuous import ContinuousKWS
from lsm_tpu.models.streaming import StreamingKWS, wire_silence
from lsm_tpu.readout import logistic, scaler

import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    fcfg = FrontendConfig(n_filters=16, filterbank="gammatone")
    rcfg = ReservoirConfig(
        num_neurons=128, num_output_neurons=64, small_world_k=16,
        mean_weight=0.03,
    )
    params = res.init_reservoir(rcfg, n_channels=16)
    d = 5 * 64
    rng = np.random.default_rng(0)
    readout = logistic.LogisticParams(
        w=jnp.asarray(rng.normal(0, 0.1, (d, 4)).astype(np.float32)),
        b=jnp.zeros((4,), jnp.float32),
    )
    st = scaler.ScalerState(
        mean=jnp.zeros((d,), jnp.float32), scale=jnp.ones((d,), jnp.float32)
    )
    return params, readout, st, fcfg


def _wire(chunk_f32, dtype):
    if dtype == np.float32:
        return chunk_f32
    if dtype == np.int16:
        from lsm_tpu.io.wav import to_pcm16_wire

        return to_pcm16_wire(chunk_f32)
    from lsm_tpu.ops.ulaw import encode_ulaw_f32

    return encode_ulaw_f32(chunk_f32)


@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
@pytest.mark.parametrize("engine", ["exact", "continuous"])
def test_step_active_bit_equal(setup, engine, dtype, rng):
    params, readout, st, fcfg = setup
    n, L = 6, 1600
    mk = (
        (lambda: StreamingKWS(params, readout, st, fcfg, "original", n))
        if engine == "exact"
        else (lambda: ContinuousKWS(params, readout, st, fcfg, "original",
                                    n, chunk_len=L))
    )
    active = np.array([1, 4, 5])
    ref, kws = mk(), mk()
    for step in range(4):
        chunk = (rng.standard_normal((n, L)) * 0.2).astype(np.float32)
        wire_full = _wire(chunk, dtype)
        # Full wire with true silence in the inactive rows.
        silent = np.setdiff1d(np.arange(n), active)
        wire_full[silent] = wire_silence(wire_full.dtype)
        out_ref = ref.step(wire_full)
        out_act = kws.step_active(wire_full[active], active)
        np.testing.assert_array_equal(
            out_act, out_ref,
            err_msg=f"{engine}/{np.dtype(dtype)} diverged at step {step}",
        )


@pytest.mark.parametrize("engine", ["exact", "continuous"])
def test_step_active_mesh_matches_single(setup, engine, rng):
    from lsm_tpu.parallel.mesh import make_mesh

    params, readout, st, fcfg = setup
    mesh = make_mesh(n_data=4, n_model=1)
    n, L = 8, 1600
    active = np.array([0, 5, 6])

    def mk(m):
        if engine == "exact":
            return StreamingKWS(params, readout, st, fcfg, "original", n,
                                mesh=m)
        return ContinuousKWS(params, readout, st, fcfg, "original", n,
                             chunk_len=L, mesh=m)

    ref, kws = mk(None), mk(mesh)
    for _ in range(3):
        rows = (rng.standard_normal((3, L)) * 0.2).astype(np.float32)
        np.testing.assert_allclose(
            kws.step_active(rows, active), ref.step_active(rows, active),
            rtol=1e-5, atol=1e-6,
        )


def test_step_active_varying_k_bit_equal(setup, rng):
    """The power-of-two k bucketing (compile-cache bound for fluctuating
    fleet activity) must not change results: a run with a DIFFERENT
    active count each step equals per-step full-wire steps."""
    params, readout, st, fcfg = setup
    n, L = 6, 1600
    mk = lambda: ContinuousKWS(params, readout, st, fcfg, "original", n,
                               chunk_len=L)
    ref, kws = mk(), mk()
    sil = wire_silence(np.float32)
    for step, k in enumerate([1, 3, 6, 2, 5]):
        idx = np.asarray(sorted(rng.permutation(n)[:k]))
        rows = (rng.standard_normal((k, L)) * 0.2).astype(np.float32)
        full = np.full((n, L), sil, np.float32)
        full[idx] = rows
        np.testing.assert_array_equal(
            kws.step_active(rows, idx), ref.step(full),
            err_msg=f"k={k} diverged at step {step}",
        )


def test_step_active_rejects_overlong_rows(setup):
    """Over-window rows must be rejected: they would silently GROW the
    exact engine's ring buffer (and change its window length forever)."""
    params, readout, st, fcfg = setup
    kws = StreamingKWS(params, readout, st, fcfg, "original", 2)
    too_long = np.zeros((2, fcfg.num_samples + 800), np.float32)
    with pytest.raises(ValueError, match="analysis window"):
        kws.step_active(too_long, [0, 1])
    assert kws.buffer.shape == (2, fcfg.num_samples)


def test_step_active_validation(setup):
    params, readout, st, fcfg = setup
    kws = StreamingKWS(params, readout, st, fcfg, "original", 4)
    rows = np.zeros((2, 1600), np.float32)
    with pytest.raises(ValueError, match="out of range"):
        kws.step_active(rows, [0, 4])
    with pytest.raises(ValueError, match="duplicate"):
        kws.step_active(rows, [1, 1])
    with pytest.raises(ValueError, match="rows"):
        kws.step_active(rows, [1])
    cont = ContinuousKWS(params, readout, st, fcfg, "original", 4,
                         chunk_len=1600)
    with pytest.raises(ValueError, match="1600-sample"):
        cont.step_active(np.zeros((1, 800), np.float32), [0])


@pytest.mark.parametrize("engine", ["exact", "continuous"])
def test_step_active_compact(setup, engine, rng):
    """compact=True packs the decision egress: preds bit-equal to argmax
    of the full-logits step_active, margins finite and non-negative."""
    params, readout, st, fcfg = setup
    n, L = 4, 1600
    mk = (
        (lambda: StreamingKWS(params, readout, st, fcfg, "original", n))
        if engine == "exact"
        else (lambda: ContinuousKWS(params, readout, st, fcfg, "original",
                                    n, chunk_len=L))
    )
    active = np.array([0, 2])
    a, b = mk(), mk()
    for _ in range(3):
        rows = (rng.standard_normal((2, L)) * 0.2).astype(np.float32)
        logits = a.step_active(rows, active)
        preds, margins = b.step_active(rows, active, compact=True)
        np.testing.assert_array_equal(preds, np.argmax(logits, axis=-1))
        assert margins.shape == (n,)
        assert np.isfinite(margins).all() and (margins >= 0).all()
