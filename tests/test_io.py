"""IO tests: WAV round-trip vs scipy, dataset walking, artifact schemas."""

import numpy as np
import pytest
import scipy.io.wavfile

from lsm_tpu.io import artifacts, dataset, wav


def test_wav_roundtrip(tmp_path, rng):
    audio = np.clip(rng.standard_normal(16000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = tmp_path / "a.wav"
    wav.write_wav(p, audio, 16000)
    y = wav.load_wav(p, 16000, duration=1.0)
    assert y.shape == (16000,)
    # write scales by 32767, decode divides by 32768 -> ~2/32768 worst case.
    np.testing.assert_allclose(y, audio, atol=1e-4)


def test_wav_decode_matches_scipy(tmp_path, rng):
    audio_i16 = (rng.standard_normal(8000) * 8000).astype(np.int16)
    p = tmp_path / "b.wav"
    scipy.io.wavfile.write(p, 16000, audio_i16)
    x, rate = wav.decode_wav(p.read_bytes())
    assert rate == 16000
    np.testing.assert_allclose(x[:, 0], audio_i16 / 32768.0, atol=1e-6)


def test_wav_stereo_downmix_and_resample(tmp_path):
    # A 500 Hz tone on both channels: downmix is the same tone; the sinc
    # upsample to 16 kHz must reconstruct it nearly exactly.
    t8 = np.arange(4000) / 8000.0
    tone = np.sin(2 * np.pi * 500.0 * t8)
    stereo = np.stack([tone, tone], axis=1)
    stereo_i16 = (stereo * 8000).astype(np.int16)
    p = tmp_path / "c.wav"
    scipy.io.wavfile.write(p, 8000, stereo_i16)
    y = wav.load_wav(p, 16000, duration=1.0)
    # 0.5 s at 8 kHz -> 0.5 s at 16 kHz = 8000 samples.
    assert abs(len(y) - 8000) <= 2
    t16 = np.arange(len(y)) / 16000.0
    ref = (8000.0 / 32768.0) * np.sin(2 * np.pi * 500.0 * t16)
    m = 64  # kernel half-width rings at the zero-padded edges
    err = y[m:-m] - ref[m:-m]
    snr = 10 * np.log10(np.sum(ref[m:-m] ** 2) / np.sum(err**2))
    assert snr > 55.0, f"resampled tone SNR {snr:.1f} dB"


def test_wav_errors_are_wav_errors():
    with pytest.raises(wav.WavError):
        wav.decode_wav(b"not a wav file at all........................................")


def test_unsupported_container_is_named_loudly(tmp_path):
    """A recognizable FLAC/OGG/MP3/AIFF/MP4 head must produce the
    actionable unsupported-container message (naming the format and the
    ffmpeg fix), not a bare 'not a RIFF/WAVE file' — on BOTH decode
    paths (NumPy decode_wav and the native batch error accounting)."""
    heads = {
        b"fLaC" + bytes(40): "FLAC",
        b"OggS" + bytes(40): "Ogg",
        b"ID3\x04" + bytes(40): "MP3",
        b"\xff\xfb\x90\x00" + bytes(40): "MP3",          # bare MPEG frame
        b"FORM\x00\x00\x00\x2eAIFF" + bytes(32): "AIFF",
        b"\x00\x00\x00\x20ftypM4A " + bytes(32): "MP4/M4A",
    }
    for head, name in heads.items():
        with pytest.raises(wav.WavError, match=name):
            wav.decode_wav(head)
        with pytest.raises(wav.WavError, match="ffmpeg"):
            wav.decode_wav(head)
    # An unrecognized head keeps the generic message — including bytes
    # that match the 11-bit MPEG frame sync but fail the rest of the
    # frame-header validity checks (e.g. a headerless PCM dump whose
    # first int16 sample is 0xFFFF, or reserved layer bits): those must
    # NOT be confidently mislabeled as MP3.
    for head in (bytes(44),
                 b"\xff\xff\xff\xff" + bytes(40),   # bitrate nibble 0xF
                 b"\xff\xe1\x00\x00" + bytes(40),   # layer bits reserved
                 b"\xff\xfb\x0c\x00" + bytes(40)):  # sample-rate reserved
        with pytest.raises(wav.WavError, match="not a RIFF/WAVE file"):
            wav.decode_wav(head)
    # Batch loaders collect the same message per file instead of raising.
    flac = tmp_path / "song.flac"
    flac.write_bytes(b"fLaC" + bytes(60))
    for use_native in (False, True):
        batch, kept, errors = wav.load_audio_batch(
            [flac], 16000, 1.0, use_native=use_native
        )
        assert kept == []
        assert len(errors) == 1 and "FLAC" in errors[0][1], (
            use_native, errors)


def test_load_audio_batch_pads_and_skips(tmp_path, rng):
    good = tmp_path / "good.wav"
    wav.write_wav(good, rng.standard_normal(8000).astype(np.float32) * 0.1)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"garbage")
    batch, kept, errors = wav.load_audio_batch(
        [good, bad], 16000, 1.0, use_native=False
    )
    assert batch.shape == (1, 16000)
    assert kept == [0]
    assert len(errors) == 1
    # Right-padded with zeros.
    assert np.all(batch[0, 8000:] == 0)


def test_index_speech_commands(tmp_path):
    dataset.write_synthetic_corpus(tmp_path, ["yes", "no"], n_per_class=3)
    idx = dataset.index_speech_commands(tmp_path, ["yes", "no", "missing"], 2)
    assert len(idx.files) == 4  # capped at 2 per class
    assert list(idx.labels) == [0, 0, 1, 1]
    assert any("missing" in w for w in idx.warnings)


def test_synthetic_classes_are_distinct():
    x, y = dataset.synthetic_audio_batch(n_per_class=2, n_classes=4, seed=7)
    assert x.shape == (8, 16000)
    assert np.abs(x).max() <= 1.0
    # Different classes differ substantially in spectrum.
    s0 = np.abs(np.fft.rfft(x[0]))
    s6 = np.abs(np.fft.rfft(x[6]))
    corr = np.corrcoef(s0, s6)[0, 1]
    assert corr < 0.9


def test_spike_dataset_artifact_roundtrip(tmp_path, rng):
    x = (rng.random((10, 8, 40)) < 0.2).astype(np.uint8)
    y = rng.integers(0, 3, 10).astype(np.int32)
    p = tmp_path / artifacts.SPIKE_DATASET_FILENAME
    artifacts.save_spike_dataset(p, artifacts.SpikeDataset(x, y))
    ds = artifacts.load_spike_dataset(p)
    np.testing.assert_array_equal(ds.x_spikes, x)
    np.testing.assert_array_equal(ds.y_labels, y)
    # Exact key names = the compatibility surface.
    raw = np.load(p)
    assert set(raw.files) == {"X_spikes", "y_labels"}
    assert raw["X_spikes"].dtype == np.uint8
    assert raw["y_labels"].dtype == np.int32


def test_features_artifact_roundtrip(tmp_path, rng):
    art = artifacts.FeatureArtifact(
        x_train=rng.standard_normal((6, 5)).astype(np.float32),
        y_train=rng.integers(0, 2, 6).astype(np.int32),
        x_test=rng.standard_normal((2, 5)).astype(np.float32),
        y_test=rng.integers(0, 2, 2).astype(np.int32),
        feature_set="original",
        leak_variance_divisor=None,
    )
    p = tmp_path / artifacts.FEATURES_FILENAME
    artifacts.save_features(p, art)
    back = artifacts.load_features(p)
    np.testing.assert_allclose(back.x_train, art.x_train)
    assert back.feature_set == "original"
    assert back.leak_variance_divisor is None
    raw = np.load(p, allow_pickle=True)
    assert {"X_train_features", "y_train", "X_test_features", "y_test",
            "feature_set", "leak_variance_divisor"} <= set(raw.files)


def test_missing_artifacts_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        artifacts.load_spike_dataset(tmp_path / "nope.npz")
    with pytest.raises(FileNotFoundError):
        artifacts.load_features(tmp_path / "nope.npz")


def test_wav_extensible_subformat(tmp_path, rng):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) must dispatch on the SubFormat
    GUID's format code: an extensible IEEE-float file decodes as float
    (assuming PCM would read the float bit patterns as int32 noise), an
    extensible PCM16 file as PCM, and a GUID-less extensible fmt chunk
    fails loudly."""
    import struct

    def extensible_wav(fmt_code, payload, bits):
        # 40-byte fmt body: standard 16 + cbSize(22) + the extension,
        # whose last 16 bytes are the SubFormat GUID (format code first).
        guid = struct.pack("<H", fmt_code) + b"\x00\x00" + b"\x10" * 12
        fmt_body = struct.pack(
            "<HHIIHH", 0xFFFE, 1, 16000, 16000 * bits // 8, bits // 8, bits
        ) + struct.pack("<HHI", 22, bits, 3) + guid
        return (
            b"RIFF" + struct.pack("<I", 20 + len(fmt_body) + len(payload))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + b"data" + struct.pack("<I", len(payload)) + payload
        )

    audio = (rng.standard_normal(1000) * 0.3).astype(np.float32)

    fl = extensible_wav(3, audio.tobytes(), 32)
    x, rate = wav.decode_wav(fl)
    assert rate == 16000
    np.testing.assert_allclose(x[:, 0], audio, rtol=1e-6)

    pcm = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
    pc = extensible_wav(1, pcm.tobytes(), 16)
    x, _ = wav.decode_wav(pc)
    np.testing.assert_allclose(x[:, 0], pcm.astype(np.float32) / 32768.0)

    # fmt chunk too short to hold the GUID: loud error, not a PCM guess.
    short = extensible_wav(1, pcm.tobytes(), 16)
    # Truncate the fmt body to the bare 16 bytes (rewrite the size field).
    body16 = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    short = (
        b"RIFF" + struct.pack("<I", 20 + 16 + len(pcm.tobytes())) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + body16
        + b"data" + struct.pack("<I", len(pcm.tobytes())) + pcm.tobytes()
    )
    with pytest.raises(wav.WavError, match="SubFormat"):
        wav.decode_wav(short)

    # The native C++ decoder dispatches identically (float parity).
    from lsm_tpu.io import native

    if native.available():
        p = tmp_path / "ext_float.wav"
        p.write_bytes(fl)
        batch, kept, errors = native.load_audio_batch([p], 16000, 1.0)
        assert kept == [0] and not errors
        np.testing.assert_allclose(batch[0, :1000], audio, rtol=1e-6)


def test_load_features_reference_object_lvd(tmp_path, rng):
    """A REFERENCE-produced features artifact stores
    leak_variance_divisor=None as a pickled object scalar
    (extract_lsm_features.py:203-212): loading must succeed (with the
    pickle-fallback warning) and yield lvd=None, while our own artifacts
    load pickle-free."""
    x = rng.standard_normal((8, 10)).astype(np.float32)
    y = np.arange(8) % 2
    p = tmp_path / "ref_features.npz"
    # Exactly what the reference's np.savez_compressed writes for None.
    np.savez_compressed(
        p,
        X_train_features=x, y_train=y,
        X_test_features=x, y_test=y,
        feature_set="original",
        leak_variance_divisor=None,
    )
    art = artifacts.load_features(p)
    assert art.leak_variance_divisor is None
    assert art.feature_set == "original"
    np.testing.assert_array_equal(art.x_train, x)
