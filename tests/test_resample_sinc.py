"""Windowed-sinc resampler quality + NumPy/C++ parity (VERDICT item 7).

The reference resamples through librosa's default soxr_hq
(create_dataset.py:26). The rebuild's non-16kHz path must be the same
quality class — these tests pin reconstruction SNR on a pure tone (which a
linear interpolator fails by ~30 dB) and bit-level agreement between the
NumPy oracle and the native C++ decoder.
"""

import numpy as np
import pytest

from lsm_tpu.io import wav


def _tone(rate: int, freq: float, seconds: float = 1.0) -> np.ndarray:
    t = np.arange(int(rate * seconds)) / rate
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _snr_db(y: np.ndarray, ref: np.ndarray) -> float:
    err = y - ref
    return 10 * np.log10(float(np.sum(ref**2)) / max(float(np.sum(err**2)), 1e-30))


@pytest.mark.parametrize("src", [22050, 44100, 8000])
def test_sinc_tone_reconstruction(src):
    """Downsampling 22.05k/44.1k and upsampling 8k must reconstruct an
    in-band tone to >60 dB SNR (linear interpolation manages ~35 dB)."""
    x = _tone(src, 1000.0)
    y = wav.resample_sinc(x, src, 16000)
    assert len(y) == round(len(x) * 16000 / src)
    t_out = np.arange(len(y)) / 16000.0
    ref = np.sin(2 * np.pi * 1000.0 * t_out).astype(np.float32)
    # Exclude the kernel half-width at each edge (zero padding rings there).
    m = 64
    snr = _snr_db(y[m:-m], ref[m:-m])
    assert snr > 60.0, f"sinc SNR {snr:.1f} dB"

    y_lin = wav.resample_linear(x, src, 16000)
    n = min(len(y_lin), len(ref))
    snr_lin = _snr_db(y_lin[m : n - m], ref[m : n - m])
    assert snr > snr_lin + 15.0, (
        f"sinc ({snr:.1f} dB) should beat linear ({snr_lin:.1f} dB)"
    )


def test_sinc_antialiasing():
    """A tone above the target Nyquist must be attenuated, not folded."""
    src = 44100
    x = _tone(src, 10000.0)  # above 8 kHz target Nyquist
    y = wav.resample_sinc(x, src, 16000)
    rms_in = float(np.sqrt(np.mean(x**2)))
    rms_out = float(np.sqrt(np.mean(y[64:-64] ** 2)))
    assert rms_out < rms_in * 10 ** (-60 / 20), (
        f"aliased energy leaked: {20*np.log10(rms_out/rms_in):.1f} dB"
    )


def test_sinc_identity_and_degenerate():
    x = _tone(16000, 440.0)
    np.testing.assert_array_equal(wav.resample_sinc(x, 16000, 16000), x)
    assert len(wav.resample_sinc(np.zeros(1, np.float32), 8000, 16000)) in (0, 2)


def test_load_wav_22050_uses_sinc(tmp_path):
    """A 22.05 kHz file decodes through the sinc path to 16 kHz."""
    x = _tone(22050, 1000.0)
    p = tmp_path / "t.wav"
    wav.write_wav(p, x, rate=22050)
    y = wav.load_wav(p, sample_rate=16000, duration=1.0)
    assert len(y) == 16000
    t_out = np.arange(len(y)) / 16000.0
    ref = np.sin(2 * np.pi * 1000.0 * t_out)
    m = 64
    # 16-bit PCM quantization bounds SNR near ~90 dB; sinc keeps >55 dB.
    assert _snr_db(y[m:-m], ref[m:-m].astype(np.float32)) > 55.0


def test_native_matches_numpy_on_non16k(tmp_path):
    """The C++ decoder's sinc resampler implements the identical kernel."""
    from lsm_tpu.io import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    x = (0.5 * rng.standard_normal(22050)).astype(np.float32)
    p = tmp_path / "n.wav"
    wav.write_wav(p, x, rate=22050)

    batch_native, kept_n, err_n = native.load_audio_batch([p], 16000, 1.0)
    batch_numpy, kept_p, err_p = wav.load_audio_batch(
        [p], 16000, 1.0, use_native=False
    )
    assert kept_n == kept_p == [0] and not err_n and not err_p
    np.testing.assert_allclose(batch_native, batch_numpy, rtol=0, atol=2e-6)
