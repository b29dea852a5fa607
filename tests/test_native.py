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
