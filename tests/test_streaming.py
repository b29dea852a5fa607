"""Streaming KWS tests: ring buffer semantics + parity with the batch path."""

import numpy as np
import jax.numpy as jnp

from lsm_tpu.config import FrontendConfig, ReservoirConfig
from lsm_tpu.models import reservoir as res
from lsm_tpu.models.frontend import featurize_batch
from lsm_tpu.models.streaming import StreamingKWS
from lsm_tpu.readout import logistic, scaler


def _setup(n_streams=2, mesh=None):
    fcfg = FrontendConfig(n_filters=16, filterbank="mel")
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
    return StreamingKWS(params, readout, st, fcfg, "original", n_streams,
                        mesh=mesh)


def test_streaming_matches_batch_on_full_window(rng):
    kws = _setup(n_streams=2)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.2
    # Push in 4 chunks of 4000 samples.
    for i in range(4):
        kws.push(audio[:, i * 4000 : (i + 1) * 4000])
    stream_logits = kws.logits()

    # Batch path on the same window.
    spikes = featurize_batch(jnp.asarray(audio), kws.fcfg)
    feats = res.extract_features_batch(kws.params, spikes, kws.keys)
    batch_logits = np.asarray(feats @ kws.readout.w + kws.readout.b)
    np.testing.assert_allclose(stream_logits, batch_logits, rtol=1e-4, atol=1e-4)


def test_streaming_window_slides(rng):
    kws = _setup(n_streams=1)
    a = rng.standard_normal((1, 16000)).astype(np.float32) * 0.2
    b = rng.standard_normal((1, 16000)).astype(np.float32) * 0.2
    kws.push(a)
    la = kws.logits()
    kws.push(b)  # full-window push replaces the buffer
    lb = kws.logits()
    assert not np.allclose(la, lb)
    kws.reset()
    silent = kws.logits()
    kws.push(np.zeros((1, 16000), np.float32))
    np.testing.assert_allclose(silent, kws.logits(), atol=1e-5)


def test_streaming_step_fused_matches_push_then_logits(rng):
    """step(chunk) (one fused dispatch) == push(chunk); logits() — same
    buffer state, same logits, chunk after chunk."""
    kws_a = _setup(n_streams=2)
    kws_b = _setup(n_streams=2)
    for i in range(5):
        chunk = rng.standard_normal((2, 1600)).astype(np.float32) * 0.2
        fused = kws_a.step(chunk)
        kws_b.push(chunk)
        two_calls = kws_b.logits()
        np.testing.assert_allclose(fused, two_calls, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kws_a.buffer), np.asarray(kws_b.buffer), atol=0
    )


def test_steps_fused_matches_k_serial_steps(rng):
    """steps_fused(chunk, k) — the bench.py amortized-timing probe — must
    advance the engine state EXACTLY as k step() calls on the same chunk
    (bit-level), and its returned checksum must equal the k-th step's
    logit sum."""
    a = _setup(n_streams=2)
    b = _setup(n_streams=2)
    chunk = rng.standard_normal((2, 1600)).astype(np.float32) * 0.2
    last = None
    for _ in range(3):
        last = a.step(chunk)
    s = b.steps_fused(chunk, 3)
    np.testing.assert_array_equal(
        np.asarray(a.buffer), np.asarray(b.buffer)
    )
    np.testing.assert_allclose(s, float(np.sum(last)), rtol=1e-5)
    # The engines stay interchangeable afterwards.
    np.testing.assert_array_equal(a.step(chunk), b.step(chunk))


def test_streaming_pipelined_stream_bit_equal(rng):
    """kws.stream(chunks) (pipelined H2D/dispatch, depth in flight) yields
    logits bit-equal to serial step() calls, at every depth, including
    int16 PCM chunks and a depth larger than the chunk count."""
    chunks = [
        (rng.standard_normal((2, 1600)) * 0.2).astype(np.float32)
        for _ in range(6)
    ]
    chunks[3] = (chunks[3] * 32768.0).astype(np.int16)  # mixed ingest dtypes
    serial = _setup(n_streams=2)
    expected = [serial.step(c) for c in chunks]
    for depth in (1, 2, 3, 10):
        kws = _setup(n_streams=2)
        got = list(kws.stream(chunks, depth=depth))
        assert len(got) == len(expected)
        for e, g in zip(expected, got):
            np.testing.assert_array_equal(e, g)
        np.testing.assert_array_equal(
            np.asarray(kws.buffer), np.asarray(serial.buffer)
        )


def test_streaming_step_accepts_int16_pcm(rng):
    """int16 PCM chunks == float chunks scaled by the decoders' exact
    /32768 convention, bit-equal logits."""
    kws_a = _setup(n_streams=1)
    kws_b = _setup(n_streams=1)
    pcm = rng.integers(-2000, 2000, (1, 1600)).astype(np.int16)
    la = kws_a.step(pcm)
    lb = kws_b.step(pcm.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(la, lb)


def test_streaming_mesh_matches_single_device(rng):
    """Mesh-sharded streams (shard_map over the data axis) produce
    bit-equal logits and buffer state vs the single-device path for the
    same streams — the configs[4] scale-out contract."""
    from lsm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=1)
    kws_m = _setup(n_streams=8, mesh=mesh)
    kws_s = _setup(n_streams=8)
    for i in range(3):
        chunk = rng.standard_normal((8, 1600)).astype(np.float32) * 0.2
        if i == 1:  # int16 PCM ingest works sharded too
            chunk = (chunk * 32768.0).astype(np.int16)
        lm = kws_m.step(chunk)
        ls = kws_s.step(chunk)
        np.testing.assert_array_equal(lm, ls)
    np.testing.assert_array_equal(
        np.asarray(kws_m.buffer), np.asarray(kws_s.buffer)
    )
    # push + logits (two-dispatch path) agrees as well, and reset clears.
    chunk = rng.standard_normal((8, 1600)).astype(np.float32) * 0.2
    kws_m.push(chunk)
    kws_s.push(chunk)
    np.testing.assert_array_equal(kws_m.logits(), kws_s.logits())
    kws_m.reset(stream_idx=3)
    kws_s.reset(stream_idx=3)
    np.testing.assert_array_equal(
        np.asarray(kws_m.buffer), np.asarray(kws_s.buffer)
    )


def test_streaming_mesh_rejects_indivisible_streams():
    import pytest

    from lsm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=1)
    with pytest.raises(ValueError):
        _setup(n_streams=6, mesh=mesh)


def test_streaming_ingest_contract(rng):
    """push and step share the ingest policy: int16 PCM scales /32768 on
    both; other int dtypes and window-overflow chunks are rejected."""
    import pytest

    kws_a = _setup(n_streams=1)
    kws_b = _setup(n_streams=1)
    pcm = rng.integers(-2000, 2000, (1, 1600)).astype(np.int16)
    kws_a.push(pcm)
    kws_b.push(pcm.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(kws_a.logits(), kws_b.logits())

    with pytest.raises(TypeError):
        kws_a.step(pcm.astype(np.int32))
    with pytest.raises(ValueError):
        kws_a.step(np.zeros((1, 16001), np.float32))
    with pytest.raises(ValueError):
        kws_a.push(np.zeros((1, 16001), np.float32))


def test_step_compact_matches_step(rng):
    """step_compact preds bit-equal argmax(step logits); margin equals the
    top-1/top-2 logit gap within f16 rounding (twin instances, same
    chunks — compact and full must describe the same decision)."""
    kws_a, kws_b = _setup(n_streams=4), _setup(n_streams=4)
    for i in range(3):
        chunk = rng.standard_normal((4, 4000)).astype(np.float32) * 0.2
        logits = kws_a.step(chunk)
        preds, margin = kws_b.step_compact(chunk)
        np.testing.assert_array_equal(preds, np.argmax(logits, -1))
        srt = np.sort(logits, axis=-1)
        want = (srt[:, -1] - srt[:, -2]).astype(np.float16)
        np.testing.assert_array_equal(margin.astype(np.float16), want)
        assert (margin >= 0).all()


def test_step_compact_mesh_matches_single_device(rng):
    from lsm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=1)
    kws_s, kws_m = _setup(n_streams=4), _setup(n_streams=4, mesh=mesh)
    for _ in range(2):
        chunk = rng.standard_normal((4, 4000)).astype(np.float32) * 0.2
        ps, ms = kws_s.step_compact(chunk)
        pm, mm = kws_m.step_compact(chunk)
        np.testing.assert_array_equal(ps, pm)
        # shard_map reduction order perturbs logits at the f32 ulp level,
        # which can flip the f16-rounded margin by one ulp — allow that.
        np.testing.assert_allclose(ms, mm, rtol=2e-3, atol=0.5)


def test_step_compact_accepts_wire_formats(rng):
    """Compact output composes with the compressed ingest (int16/ulaw)."""
    from lsm_tpu.ops.ulaw import decode_ulaw_reference, encode_ulaw_f32

    f32 = (rng.standard_normal((4, 4000)) * 0.2).clip(-1, 1).astype(np.float32)
    wire = encode_ulaw_f32(f32)
    decoded = decode_ulaw_reference(wire).astype(np.float32) / 32768.0
    kws_u, kws_f = _setup(n_streams=4), _setup(n_streams=4)
    pu, mu = kws_u.step_compact(wire)
    pf, mf = kws_f.step_compact(decoded)
    np.testing.assert_array_equal(pu, pf)
    np.testing.assert_array_equal(mu, mf)


def test_streaming_matches_batch_random_configs(rng):
    """The exact engine's bit-identity with the batch pipeline must hold
    across the CONFIG SPACE, not just the pinned defaults: random
    filterbanks, filter counts, thresholds, gaps, and chunk geometries
    (uneven chunks included)."""
    r = np.random.default_rng(123)
    for trial in range(3):
        fcfg = FrontendConfig(
            n_filters=int(r.choice([8, 24, 48])),
            filterbank=str(r.choice(["gammatone", "mel"])),
            spike_thresholds=tuple(
                sorted(r.uniform(0.3, 0.95, size=int(r.integers(2, 5))))
            ),
            hysteresis_gap=float(r.uniform(0.02, 0.2)),
        )
        rcfg = ReservoirConfig(
            num_neurons=96, num_output_neurons=48, small_world_k=12,
            mean_weight=0.04,
        )
        params = res.init_reservoir(rcfg, n_channels=fcfg.n_filters)
        d = 5 * 48
        ro = logistic.LogisticParams(
            w=jnp.asarray(r.normal(0, 0.1, (d, 3)).astype(np.float32)),
            b=jnp.zeros((3,), jnp.float32),
        )
        st = scaler.ScalerState(
            mean=jnp.zeros((d,), jnp.float32),
            scale=jnp.ones((d,), jnp.float32),
        )
        kws = StreamingKWS(params, ro, st, fcfg, "original", 2)
        audio = (r.standard_normal((2, 16000)) * 0.3).astype(np.float32)
        # Uneven chunk sizes that tile the window.
        cuts = [0, 3000, 7000, 8000, 16000]
        out = None
        for a, b in zip(cuts, cuts[1:]):
            out = kws.step(audio[:, a:b])

        spikes = featurize_batch(jnp.asarray(audio), fcfg)
        feats = res.extract_features_batch(params, spikes, kws.keys)
        batch_logits = np.asarray(feats @ ro.w + ro.b)
        np.testing.assert_allclose(
            out, batch_logits, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: {fcfg}",
        )
