"""StreamPool session manager (models/pool.py): the admit/step/finish/
drain lifecycle must be bit-equal to driving the engine directly —
no new device semantics, just the composition."""

import numpy as np
import pytest
import jax.numpy as jnp

from lsm_tpu.config import FrontendConfig, ReservoirConfig
from lsm_tpu.models import reservoir as res
from lsm_tpu.models.continuous import ContinuousKWS
from lsm_tpu.models.pool import PoolFullError, StreamPool
from lsm_tpu.models.streaming import wire_silence
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
    rng = np.random.default_rng(0)
    readout = logistic.LogisticParams(
        w=jnp.asarray(rng.normal(0, 0.1, (d, 4)).astype(np.float32)),
        b=jnp.zeros((4,), jnp.float32),
    )
    st = scaler.ScalerState(
        mean=jnp.zeros((d,), jnp.float32), scale=jnp.ones((d,), jnp.float32)
    )
    return params, readout, st, fcfg


def _mk(setup, n=4):
    params, readout, st, fcfg = setup
    return ContinuousKWS(params, readout, st, fcfg, "original", n,
                         chunk_len=L)


def test_pool_lifecycle_bit_equal_to_direct_engine(setup, rng):
    """Two sessions in a 4-slot pool, one silent hop, one finish+readmit:
    every decision equals argmax of a directly-driven engine fed full
    chunks with silence in the unconnected rows."""
    pool = StreamPool(_mk(setup))
    ref = _mk(setup)

    a_slot = pool.admit("a")
    b_slot = pool.admit("b")
    assert {a_slot, b_slot} == {0, 1}
    with pytest.raises(ValueError, match="already admitted"):
        pool.admit("a")

    def ref_step(rows_by_slot):
        full = np.full((4, L), wire_silence(np.float32), np.float32)
        for slot, row in rows_by_slot.items():
            full[slot] = row
        return np.argmax(ref.step(full), axis=-1)

    audio = (rng.standard_normal((6, L)) * 0.2).astype(np.float32)

    # Hop 1: both speak.
    out = pool.step({"a": audio[0], "b": audio[1]})
    want = ref_step({a_slot: audio[0], b_slot: audio[1]})
    assert out["a"][0] == want[a_slot] and out["b"][0] == want[b_slot]

    # Hop 2: "b" silent (not in the dict) — still gets a decision.
    out = pool.step({"a": audio[2]})
    want = ref_step({a_slot: audio[2]})
    assert out["a"][0] == want[a_slot] and out["b"][0] == want[b_slot]
    assert set(out) == {"a", "b"}

    # Finish "a"; admit "c" into the recycled slot: the ref engine resets
    # that slot too (admit == reset + claim).
    pool.finish("a")
    c_slot = pool.admit("c")
    assert c_slot == a_slot
    ref.reset(c_slot)
    out = pool.step({"c": audio[3], "b": audio[4]})
    want = ref_step({c_slot: audio[3], b_slot: audio[4]})
    assert out["c"][0] == want[c_slot] and out["b"][0] == want[b_slot]

    with pytest.raises(KeyError, match="not admitted"):
        pool.step({"ghost": audio[5]})


def test_pool_all_silent_hop_advances_state(setup, rng):
    pool = StreamPool(_mk(setup))
    ref = _mk(setup)
    pool.admit("a")
    audio = (rng.standard_normal((1, L)) * 0.2).astype(np.float32)

    silence = np.full((4, L), wire_silence(np.float32), np.float32)
    out = pool.step({})                      # nobody spoke this hop
    assert set(out) == {"a"}
    want = np.argmax(ref.step(silence), axis=-1)
    assert out["a"][0] == want[0]

    # State advanced identically: next hop still matches.
    out = pool.step({"a": audio[0]})
    full = silence.copy()
    full[0] = audio[0]
    want = np.argmax(ref.step(full), axis=-1)
    assert out["a"][0] == want[0]


def test_pool_silent_hop_honors_wire_dtype(setup, rng):
    """An all-silent hop on a mu-law pool synthesizes mu-law silence
    (0xFF), not a float32 guess: decisions stay bit-equal to a directly
    driven engine fed wire_silence rows in the deployment dtype — both
    with an explicit wire_dtype (silence can be the FIRST hop) and with
    one inferred from a fed hop."""
    from lsm_tpu.ops.ulaw import encode_ulaw_f32

    pool = StreamPool(_mk(setup), wire_dtype=np.uint8)
    ref = _mk(setup)
    pool.admit("a")
    silence = np.full((4, L), wire_silence(np.uint8), np.uint8)
    out = pool.step({})                  # silent FIRST hop, mu-law wire
    want = np.argmax(ref.step(silence), axis=-1)
    assert out["a"][0] == want[0]

    wire = encode_ulaw_f32(
        (rng.standard_normal(L) * 0.2).astype(np.float32)
    )
    out = pool.step({"a": wire})
    full = silence.copy()
    full[0] = wire
    want = np.argmax(ref.step(full), axis=-1)
    assert out["a"][0] == want[0]

    out = pool.step({})                  # inferred dtype after a fed hop
    want = np.argmax(ref.step(silence), axis=-1)
    assert out["a"][0] == want[0]


def test_pool_save_restore_round_trip(setup, rng, tmp_path):
    """StreamPool.save persists the WHOLE serving unit: after a restart
    (fresh engine + restore) every connected session continues bit-equal
    to the uninterrupted pool — same slots, same free-list order (the
    next admit lands where it would have), same silent-hop wire dtype."""
    pool = StreamPool(_mk(setup))
    cont = StreamPool(_mk(setup))          # the uninterrupted reference
    for p in (pool, cont):
        p.admit("a")
        p.admit(7)                          # int ids round-trip as ints
    audio = (rng.standard_normal((4, L)) * 0.2).astype(np.float32)
    for p in (pool, cont):
        p.step({"a": audio[0], 7: audio[1]})
        p.finish("a")                       # slot 0 joins the free list

    path = tmp_path / "pool.npz"
    pool.save(path)
    restored = StreamPool.restore(path, _mk(setup))
    assert restored.slot_of(7) == cont.slot_of(7)
    assert isinstance(list(restored._slot_of)[0], int)

    out = restored.step({7: audio[2]})
    want = cont.step({7: audio[2]})
    assert out == want
    # Free-list order survived: the next admit claims the same slot.
    assert restored.admit("c") == cont.admit("c")
    out = restored.step({"c": audio[3]})
    want = cont.step({"c": audio[3]})
    assert out == want


def test_pool_save_restore_rejects_bad_inputs(setup, tmp_path):
    from lsm_tpu.io.serving_state import save_serving_state

    pool = StreamPool(_mk(setup))
    pool.admit(("tuple", "id"))             # fine to serve, not to save
    with pytest.raises(TypeError, match="JSON scalar"):
        pool.save(tmp_path / "x.npz")

    # Engine-only snapshot: restore must say what's missing.
    eng = _mk(setup)
    path = tmp_path / "engine_only.npz"
    save_serving_state(path, eng)
    with pytest.raises(ValueError, match="no pool session table"):
        StreamPool.restore(path, _mk(setup))


def test_pool_restore_rejects_corrupt_session_table(setup, rng, tmp_path):
    """A hand-edited table that double-books a slot must fail loudly —
    BEFORE the engine install, so the target engine's state is
    untouched by the rejected file."""
    import json

    pool = StreamPool(_mk(setup))
    pool.admit("a")
    audio = (rng.standard_normal((4, L)) * 0.2).astype(np.float32)
    pool.step({"a": audio[0]})
    path = tmp_path / "pool.npz"
    pool.save(path)
    with np.load(path, allow_pickle=False) as data:
        arrays = {k: data[k] for k in data.files if k != "meta"}
        meta = json.loads(str(data["meta"]))
    meta["pool"]["free"] = meta["pool"]["free"] + [0]  # slot 0 also claimed
    np.savez(path, meta=json.dumps(meta), **arrays)

    target, ref = _mk(setup), _mk(setup)
    target.step(audio[1:2].repeat(4, 0))
    ref.step(audio[1:2].repeat(4, 0))
    with pytest.raises(ValueError, match="do not partition"):
        StreamPool.restore(path, target)
    # The rejected restore mutated nothing: target still tracks ref.
    np.testing.assert_array_equal(
        np.asarray(target.step(audio[2:3].repeat(4, 0))),
        np.asarray(ref.step(audio[2:3].repeat(4, 0))),
    )


def test_pool_capacity_and_drain(setup, rng):
    src = StreamPool(_mk(setup, n=2))
    dst = StreamPool(_mk(setup, n=2))
    ref = _mk(setup, n=2)

    src.admit("x")
    src.admit("y")
    with pytest.raises(PoolFullError):
        src.admit("z")

    audio = (rng.standard_normal((4, 2, L)) * 0.2).astype(np.float32)
    for hop in range(2):
        src.step({"x": audio[hop, 0], "y": audio[hop, 1]})
        ref.step(audio[hop])

    # Drain rollback: dst too small for both + an existing tenant.
    dst.admit("tenant")
    with pytest.raises(PoolFullError):
        src.drain(["x", "y"], dst)
    assert src.n_active == 2 and dst.n_active == 1   # nothing moved
    dst.finish("tenant")

    # Real drain: sessions continue bit-equal to the uninterrupted run
    # (each session keeps receiving ITS audio, whatever slot it landed in).
    src.drain(["x", "y"], dst)
    assert src.n_active == 0 and dst.n_active == 2
    for hop in range(2, 4):
        dst.step({"x": audio[hop, 0], "y": audio[hop, 1]})
        ref.step(audio[hop])
    # Bit-equality at the logits level on a fresh chunk.
    extra = (rng.standard_normal((2, L)) * 0.2).astype(np.float32)
    ref_logits = ref.step(extra)
    full = np.full((2, L), wire_silence(np.float32), np.float32)
    full[dst.slot_of("x")] = extra[0]
    full[dst.slot_of("y")] = extra[1]
    dst_logits = dst.kws.step(full)
    np.testing.assert_array_equal(
        dst_logits[dst.slot_of("x")], ref_logits[0],
        err_msg="drained session x diverged",
    )
    np.testing.assert_array_equal(
        dst_logits[dst.slot_of("y")], ref_logits[1],
        err_msg="drained session y diverged",
    )


def test_pool_review_guards(setup, rng):
    """Review fixes: mixed wire dtypes fail loudly; an all-silent hop on
    an exact-mode pool needs an explicit chunk_len (or a prior fed hop);
    drain rolls back on ANY failure, including a session already living
    in the destination."""
    from lsm_tpu.models.streaming import StreamingKWS

    params, readout, st, fcfg = setup

    pool = StreamPool(_mk(setup))
    pool.admit("a")
    pool.admit("b")
    with pytest.raises(ValueError, match="mixed wire dtypes"):
        pool.step({
            "a": np.zeros(L, np.float32),
            "b": np.zeros(L, np.int16),
        })

    exact = StreamPool(StreamingKWS(params, readout, st, fcfg,
                                    "original", 2))
    exact.admit("a")
    with pytest.raises(ValueError, match="all-silent hop"):
        exact.step({})
    # With an explicit hop size (or after a fed hop) silence advances.
    exact2 = StreamPool(
        StreamingKWS(params, readout, st, fcfg, "original", 2),
        chunk_len=400,
    )
    exact2.admit("a")
    out = exact2.step({})
    assert set(out) == {"a"}
    exact.step({"a": np.zeros(400, np.float32)})
    exact.step({})                               # inferred from the fed hop

    # Drain rollback on ValueError (session already in dst).
    src = StreamPool(_mk(setup, n=2))
    dst = StreamPool(_mk(setup, n=4))
    src.admit("x")
    src.admit("y")
    dst.admit("y")
    with pytest.raises(ValueError, match="already admitted"):
        src.drain(["x", "y"], dst)
    assert src.n_active == 2 and dst.n_active == 1   # nothing moved
    with pytest.raises(ValueError, match="duplicate"):
        src.drain(["x", "x"], dst)
    # Incompatible engines also roll back the claims.
    other = StreamPool(
        ContinuousKWS(params, readout, st, fcfg, "original", 2,
                      chunk_len=3200)
    )
    with pytest.raises(ValueError, match="chunk length"):
        src.drain(["x"], other)
    assert other.n_active == 0 and src.n_active == 2

    # A failed MULTI-session drain must restore the destination
    # free-list ORDER, not just its contents: the next admit on the
    # destination lands in the same slot as on a pool that never saw
    # the failed drain (claims pop the tail, so rollback unwinds in
    # reverse claim order).
    other4 = StreamPool(
        ContinuousKWS(params, readout, st, fcfg, "original", 4,
                      chunk_len=3200)
    )
    free_before = list(other4._free)
    with pytest.raises(ValueError, match="chunk length"):
        src.drain(["x", "y"], other4)
    assert other4._free == free_before

    # Empty move set: a no-op, not an IndexError from the masked reset.
    src.drain([], other4)
    assert src.n_active == 2 and other4.n_active == 0

    # A malformed fed hop must NOT corrupt the cached silent-hop
    # geometry: the engine rejects the rows, and a later all-silent hop
    # still advances with the REAL hop size.
    bad = StreamPool(_mk(setup))
    bad.admit("a")
    bad.step({"a": np.zeros(L, np.float32)})          # fed hop: caches L
    with pytest.raises(ValueError, match="chunks"):
        bad.step({"a": np.zeros(L // 2, np.float32)})  # wrong length
    assert bad._chunk_len == L
    bad.step({})                                      # silent hop still OK
