"""Long-run serving stability (soak) + randomized pool lifecycle.

The bit-level contracts live in test_continuous/test_pool; these tests
police what only shows up over MANY hops of adversarial audio — state
drift (norm peak/floor, membrane, segment rings must stay finite and
bounded), the causal normalization's decay during long silence, and the
pool's bookkeeping under a random admit/step/finish/save/restore
sequence against a directly-driven engine oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from lsm_tpu.config import FrontendConfig, ReservoirConfig
from lsm_tpu.models import reservoir as res
from lsm_tpu.models.continuous import ContinuousKWS
from lsm_tpu.models.pool import StreamPool
from lsm_tpu.models.streaming import StreamingKWS, wire_silence
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


def _adversarial_hops(r, n_streams, n_hops):
    """Loud noise, long silence, DC offset, full-scale clipping, a tone —
    the ingest regimes an always-on deployment actually sees."""
    t = np.arange(L, dtype=np.float32)
    for h in range(n_hops):
        kind = h % 5
        if kind == 0:
            yield (r.standard_normal((n_streams, L)) * 0.5).astype(np.float32)
        elif kind == 1:
            yield np.zeros((n_streams, L), np.float32)
        elif kind == 2:
            yield np.full((n_streams, L), 0.3, np.float32)
        elif kind == 3:
            yield np.clip(
                r.standard_normal((n_streams, L)) * 3.0, -1.0, 1.0
            ).astype(np.float32)
        else:
            yield np.tile(
                np.sin(2 * np.pi * 440.0 * t / 16000.0, dtype=np.float32)
                * 0.8,
                (n_streams, 1),
            )


def test_continuous_soak_stability(setup, rng):
    params, readout, st, fcfg = setup
    kws = ContinuousKWS(params, readout, st, fcfg, "original", 2,
                        chunk_len=L)
    for chunk in _adversarial_hops(rng, 2, 40):
        out = kws.step(chunk)
        assert np.isfinite(out).all(), "non-finite logits mid-soak"

    # Every carried state leaf is finite after the soak.
    snap = kws.snapshot()
    for k, v in snap.items():
        arr = np.asarray(v, np.float64)
        assert np.isfinite(arr[arr > -np.inf]).all() or k.startswith("seg"), k
        if k in ("v", "norm_hi", "norm_lo", "win_ring"):
            assert np.isfinite(arr).all(), k
    # Membrane bounded: leak + reset keep it near threshold scale.
    assert np.abs(snap["v"]).max() < 100.0

    # Causal normalization decays during a long silence stretch: the
    # carried peak must drop measurably (0.1 dB/bin x 40 bins/hop).
    hi_before = np.asarray(kws.snapshot()["norm_hi"]).copy()
    for _ in range(10):
        kws.step(np.zeros((2, L), np.float32))
    hi_after = np.asarray(kws.snapshot()["norm_hi"])
    assert (hi_after < hi_before - 1.0).all(), (hi_before, hi_after)

    rep = kws.diagnostics()
    assert np.isfinite(rep.avg_participation)


def test_exact_soak_stability(setup, rng):
    params, readout, st, fcfg = setup
    kws = StreamingKWS(params, readout, st, fcfg, "original", 2)
    for chunk in _adversarial_hops(rng, 2, 25):
        out = kws.step(chunk)
        assert np.isfinite(out).all()
    # The f32 wire is pass-through (no clamping contract — the featurizer
    # min-max normalizes), so the only stability invariant is finiteness.
    assert np.isfinite(np.asarray(kws.buffer)).all()


def test_pool_random_lifecycle_vs_oracle(setup, rng, tmp_path):
    """~35 random admit/step/finish ops (plus one mid-sequence
    save/restore onto a fresh engine) must track a directly-driven
    engine: the pool's decision for every connected session equals the
    oracle's argmax at that slot, every hop."""
    params, readout, st, fcfg = setup
    n = 4

    def mk():
        return ContinuousKWS(params, readout, st, fcfg, "original", n,
                             chunk_len=L)

    pool = StreamPool(mk(), wire_dtype=np.float32, chunk_len=L)
    ref = mk()
    r = np.random.default_rng(7)
    next_id = 0
    live = {}            # session -> slot (oracle's mirror of the table)

    for op_i in range(35):
        roll = r.random()
        if op_i == 17:
            # Deterministic mid-sequence restart: save, rebuild the
            # engine, restore — the continued pool must keep tracking.
            path = tmp_path / "soak_pool.npz"
            pool.save(path)
            pool = StreamPool.restore(path, mk())
        elif roll < 0.25 and len(live) < n:
            s = f"s{next_id}"
            next_id += 1
            slot = pool.admit(s)
            ref.reset(slot)
            live[s] = slot
        elif roll < 0.4 and live:
            s = r.choice(sorted(live))
            slot = live.pop(s)
            pool.finish(s)
            ref.reset(slot)
        else:
            fed = [s for s in live if r.random() < 0.7]
            audio = {
                s: (r.standard_normal(L) * 0.4).astype(np.float32)
                for s in fed
            }
            out = pool.step(audio)
            full = np.full((n, L), wire_silence(np.float32), np.float32)
            for s, row in audio.items():
                full[live[s]] = row
            want = np.argmax(ref.step(full), axis=-1)
            assert set(out) == set(live)
            for s in live:
                assert out[s][0] == want[live[s]], (op_i, s)

    # Table still consistent at the end.
    assert pool.n_active == len(live)
    for s, slot in live.items():
        assert pool.slot_of(s) == slot
