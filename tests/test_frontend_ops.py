"""Unit tests for DSP ops: STFT/mel/dB/zoom/hysteresis vs. trusted oracles."""

import numpy as np
import pytest
import scipy.ndimage
import scipy.signal

import jax.numpy as jnp

from lsm_tpu.ops import db as db_ops
from lsm_tpu.ops import hysteresis, mel, resample, stft


def test_hann_window_matches_scipy():
    w = stft.hann_window(2048)
    ref = scipy.signal.get_window("hann", 2048, fftbins=True)
    np.testing.assert_allclose(w, ref, atol=1e-6)


def test_stft_power_matches_scipy(rng):
    n_fft, hop = 512, 160
    audio = rng.standard_normal((2, 16000)).astype(np.float32)
    ours = np.asarray(stft.stft_power(jnp.asarray(audio), n_fft, hop))
    # Oracle: manual centered framed FFT (librosa semantics, constant pad).
    pad = n_fft // 2
    win = scipy.signal.get_window("hann", n_fft, fftbins=True)
    for b in range(audio.shape[0]):
        y = np.pad(audio[b], (pad, pad))
        n_frames = 1 + 16000 // hop
        ref = np.zeros((1 + n_fft // 2, n_frames))
        for f in range(n_frames):
            seg = y[f * hop : f * hop + n_fft] * win
            ref[:, f] = np.abs(np.fft.rfft(seg)) ** 2
        np.testing.assert_allclose(ours[b], ref, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_shape_and_properties():
    fb = mel.mel_filterbank(16000, 2048, 128, 0.0, 8000.0)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # Every filter is nonempty and triangular (single max).
    assert np.all(fb.max(axis=1) > 0)
    # Slaney normalization: filters have ~constant integral over Hz.
    integrals = fb.sum(axis=1)
    assert integrals.std() / integrals.mean() < 0.25


def test_mel_filterbank_matches_librosa_formula():
    # Independent recomputation of the Slaney mel formula as an oracle.
    fb = mel.mel_filterbank(16000, 1024, 8, 0.0, 8000.0)
    # Known Slaney scale anchor points: 1000 Hz -> 15 mels.
    assert abs(mel.hz_to_mel(np.array(1000.0)) - 15.0) < 1e-9
    assert abs(mel.mel_to_hz(np.array(15.0)) - 1000.0) < 1e-6
    # Round trip.
    f = np.linspace(20, 7900, 50)
    np.testing.assert_allclose(mel.mel_to_hz(mel.hz_to_mel(f)), f, rtol=1e-10)
    assert fb.shape == (8, 513)


def test_power_to_db_matches_reference_semantics(rng):
    s = (rng.random((3, 16, 20)) * 100).astype(np.float32)
    out = np.asarray(db_ops.power_to_db(jnp.asarray(s)))
    for b in range(3):
        ref = 10 * np.log10(np.maximum(s[b], 1e-10))
        ref -= 10 * np.log10(np.maximum(s[b].max(), 1e-10))
        ref = np.maximum(ref, ref.max() - 80.0)
        np.testing.assert_allclose(out[b], ref, rtol=2e-3, atol=2e-3)


def test_minmax_normalize_degenerate_to_zeros():
    flat = jnp.ones((2, 4, 10))
    out = np.asarray(db_ops.minmax_normalize(flat))
    assert np.all(out == 0.0)


def test_zoom_matches_scipy(rng):
    # Note on the last column: scipy.ndimage.zoom computes the final output
    # coordinate as out_len-1 times (in-1)/(out-1), which for some sizes
    # rounds a hair PAST in-1 (e.g. 53 -> 100 gives 52.000000000000004) and
    # then mode='constant' zero-fills that column. The real pipeline sizes
    # (mel 101, gammatone 98) don't trigger it; we implement the intended
    # endpoint-preserving interpolation and exclude the quirk column for
    # sizes that do.
    for t_in in (101, 98, 53, 200):
        spec = rng.random((5, t_in)).astype(np.float32)
        ours = np.asarray(resample.zoom_time_axis(jnp.asarray(spec), 100))
        ref = scipy.ndimage.zoom(spec, (1, 100 / t_in), order=1)
        assert ref.shape[1] == 100
        np.testing.assert_allclose(ours[:, :-1], ref[:, :-1], rtol=1e-4, atol=1e-5)
        # Our last column is the exact input endpoint.
        np.testing.assert_allclose(ours[:, -1], spec[:, -1], rtol=1e-5)
        if t_in in (101, 98, 200):
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_hysteresis_matches_sequential_oracle(rng):
    thresholds = (0.70, 0.80, 0.90, 0.95)
    spec = rng.random((3, 16, 100)).astype(np.float32)
    ours = np.asarray(hysteresis.hysteresis_encode(jnp.asarray(spec), thresholds, 0.1))
    assert ours.shape == (3, 16, 400)
    for b in range(3):
        ref = hysteresis.hysteresis_encode_reference(spec[b], thresholds, 0.1)
        np.testing.assert_array_equal(ours[b], ref)


def test_hysteresis_holds_state_across_bins():
    # A channel rising above 0.95 then hovering in the hysteresis band must
    # stay ON until it drops below threshold - gap.
    spec = np.array([[0.99, 0.90, 0.88, 0.86, 0.70, 0.99]], dtype=np.float32)
    out = np.asarray(hysteresis.hysteresis_encode(jnp.asarray(spec), (0.95,), 0.1))
    np.testing.assert_array_equal(out[0], [1, 1, 1, 1, 0, 1])


def test_featurize_batch_int16_wire_bit_equal(rng):
    """featurize_batch(int16 PCM) == featurize_batch(f32) bit-for-bit when
    the f32 audio is PCM16-sourced (exact n/32768 values) — the cold-path
    device wire (io/wav.py:to_pcm16_wire) must be transparent."""
    from lsm_tpu.config import FrontendConfig
    from lsm_tpu.io.wav import to_pcm16_wire
    from lsm_tpu.models.frontend import featurize_batch

    pcm = rng.integers(-20000, 20000, (3, 16000)).astype(np.int16)
    f32 = pcm.astype(np.float32) / 32768.0
    assert (to_pcm16_wire(f32) == pcm).all()      # lossless round trip
    cfg = FrontendConfig(n_filters=32)
    sp_i = np.asarray(featurize_batch(jnp.asarray(pcm), cfg))
    sp_f = np.asarray(featurize_batch(jnp.asarray(f32), cfg))
    np.testing.assert_array_equal(sp_i, sp_f)


def test_featurize_batch_ulaw_wire_matches_device_decode(rng):
    """featurize_batch(uint8 mu-law) == featurize_batch(host-decoded f32)
    bit-for-bit — the third wire format of the shared ingest contract
    (ops/ulaw.py; same convention as the streaming engines)."""
    from lsm_tpu.config import FrontendConfig
    from lsm_tpu.models.frontend import featurize_batch
    from lsm_tpu.ops.ulaw import decode_ulaw_reference, encode_ulaw

    pcm = rng.integers(-20000, 20000, (3, 16000)).astype(np.int16)
    wire = encode_ulaw(pcm)
    f32 = decode_ulaw_reference(wire).astype(np.float32) / 32768.0
    cfg = FrontendConfig(n_filters=32)
    sp_u = np.asarray(featurize_batch(jnp.asarray(wire), cfg))
    sp_f = np.asarray(featurize_batch(jnp.asarray(f32), cfg))
    np.testing.assert_array_equal(sp_u, sp_f)


def test_featurize_batch_rejects_foreign_dtypes(rng):
    """The wire contract is EXACTLY three formats; int32 PCM (or bool)
    would sail through min-max normalization at the wrong scale and
    produce plausible-looking wrong spikes — reject at the boundary."""
    import pytest

    from lsm_tpu.config import FrontendConfig
    from lsm_tpu.models.frontend import featurize_batch

    cfg = FrontendConfig(n_filters=32)
    with pytest.raises(TypeError, match="wire contract"):
        featurize_batch(
            jnp.asarray(rng.integers(-1000, 1000, (2, 16000)), jnp.int32),
            cfg,
        )


def test_hysteresis_rejects_negative_gap(rng):
    """The associative formulation assumes the OFF level sits at/below
    the ON threshold; a negative gap would silently diverge from the
    sequential Schmitt oracle, so it must fail loudly."""
    import pytest

    from lsm_tpu.ops.hysteresis import (
        hysteresis_encode, hysteresis_encode_step,
    )

    spec = jnp.asarray(rng.random((8, 100)), jnp.float32)
    with pytest.raises(ValueError, match="gap must be >= 0"):
        hysteresis_encode(spec, [0.5, 0.8], -0.1)
    with pytest.raises(ValueError, match="gap must be >= 0"):
        hysteresis_encode_step(
            spec, jnp.zeros((2, 8), bool), [0.5, 0.8], -0.1
        )
