"""Native C++ WAV decoder tests: build, parity with the NumPy decoder."""

import numpy as np
import pytest

from lsm_tpu.io import native, wav


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native wavio not buildable here"
)


def test_native_matches_numpy_decoder(tmp_path, rng):
    paths = []
    for i in range(4):
        audio = np.clip(
            rng.standard_normal(8000 + 2000 * i) * 0.3, -0.99, 0.99
        ).astype(np.float32)
        p = tmp_path / f"f{i}.wav"
        wav.write_wav(p, audio, 16000)
        paths.append(p)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"garbage not a wav")
    paths.append(bad)

    nat, kept_n, err_n = native.load_audio_batch(paths, 16000, 1.0)
    ref, kept_r, err_r = wav.load_audio_batch(paths, 16000, 1.0, use_native=False)
    assert kept_n == kept_r == [0, 1, 2, 3]
    assert len(err_n) == len(err_r) == 1
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_native_resamples(tmp_path, rng):
    import scipy.io.wavfile

    audio = (rng.standard_normal(4000) * 8000).astype(np.int16)
    p = tmp_path / "r.wav"
    scipy.io.wavfile.write(p, 8000, audio)
    nat, kept, _ = native.load_audio_batch([p], 16000, 1.0)
    ref, _, _ = wav.load_audio_batch([p], 16000, 1.0, use_native=False)
    assert kept == [0]
    np.testing.assert_allclose(nat, ref, atol=1e-5)


def test_native_int16_wire_matches_f32_and_fallback(tmp_path, rng):
    """dtype='int16' (the cold-path device wire): the native decoder's
    PCM16 memcpy fast path, its f32-decode+quantize fallback (resampled
    file), and the NumPy fallback must all be bit-identical to
    to_pcm16_wire(f32 batch)."""
    import scipy.io.wavfile

    paths = []
    for i in range(3):
        audio = (rng.standard_normal(16000) * 8000).astype(np.int16)
        p = tmp_path / f"{i}.wav"
        scipy.io.wavfile.write(p, 16000, audio)      # mono PCM16 @ target
        paths.append(p)
    resampled = tmp_path / "r.wav"
    scipy.io.wavfile.write(
        resampled, 8000, (rng.standard_normal(8000) * 8000).astype(np.int16)
    )
    paths.append(resampled)                           # forces the slow path

    f32, kept_f, _ = native.load_audio_batch(paths, 16000, 1.0)
    i16, kept_i, _ = native.load_audio_batch(paths, 16000, 1.0, dtype="int16")
    assert kept_f == kept_i == [0, 1, 2, 3]
    assert i16.dtype == np.int16
    np.testing.assert_array_equal(i16, wav.to_pcm16_wire(f32))

    # The PCM16-at-rate rows are the RAW samples (memcpy fast path).
    for i, p in enumerate(paths[:3]):
        _, raw = scipy.io.wavfile.read(p)
        np.testing.assert_array_equal(i16[i], raw)

    np_i16, kept_np, _ = wav.load_audio_batch(
        paths, 16000, 1.0, dtype="int16", use_native=False
    )
    assert kept_np == kept_i
    np.testing.assert_array_equal(np_i16, i16)


def test_native_ulaw_wire_matches_fallback_and_encoder(tmp_path, rng):
    """dtype='ulaw' (the bandwidth-constrained device wire): the native
    LUT fast path (PCM16-at-rate files), its f32-decode+quantize fallback
    (resampled file), and the NumPy fallback must all be byte-identical
    to encode_ulaw(<the int16 wire>), including 0xFF (silence) padding."""
    import scipy.io.wavfile

    from lsm_tpu.ops.ulaw import encode_ulaw

    paths = []
    for i in range(3):
        audio = (rng.standard_normal(12000) * 8000).astype(np.int16)
        p = tmp_path / f"{i}.wav"
        scipy.io.wavfile.write(p, 16000, audio)      # mono PCM16 @ target
        paths.append(p)                               # short: exercises pad
    resampled = tmp_path / "r.wav"
    scipy.io.wavfile.write(
        resampled, 8000, (rng.standard_normal(8000) * 8000).astype(np.int16)
    )
    paths.append(resampled)                           # forces the slow path

    if not native.supports_ulaw():
        pytest.skip("native wavio build lacks the ulaw entry")
    i16, kept_i, _ = native.load_audio_batch(paths, 16000, 1.0, dtype="int16")
    ul, kept_u, _ = native.load_audio_batch(paths, 16000, 1.0, dtype="ulaw")
    assert kept_u == kept_i == [0, 1, 2, 3]
    assert ul.dtype == np.uint8
    np.testing.assert_array_equal(ul, encode_ulaw(i16))
    assert (ul[0, 12000:] == 0xFF).all()              # silent padding

    np_ul, kept_np, _ = wav.load_audio_batch(
        paths, 16000, 1.0, dtype="ulaw", use_native=False
    )
    assert kept_np == kept_u
    np.testing.assert_array_equal(np_ul, ul)
