"""G.711 mu-law ingest (ops/ulaw.py + the engines' uint8 wire format).

Four prongs:
1. the encoder matches the CCITT reference table exhaustively (all 65536
   int16 values, pinned against a hand-rolled segment-table oracle that
   mirrors the published reference encoder structure, NOT the vectorized
   production code);
2. the device decoder is bit-equal to the NumPy reference decoder on all
   256 bytes, and round-trip error is within the published quantization
   bound;
3. both streaming engines accept uint8 chunks and produce logits equal to
   feeding the decoded f32 samples (the wire format is transparent);
4. the full batch pipeline on mu-law round-tripped audio stays inside the
   frozen accuracy band (the codec does not cost accuracy on the hard
   benchmark).
"""

import numpy as np
import pytest

from lsm_tpu.ops import ulaw

_BIAS = 0x84
_SEG_ENDS = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]


def _lin2ulaw_scalar(x: int) -> int:
    """The published CCITT reference encoder, scalar, segment-table form."""
    if x < 0:
        x = -x
        sign = 0x80
    else:
        sign = 0
    if x > 32635:
        x = 32635
    x += _BIAS
    seg = next(i for i, end in enumerate(_SEG_ENDS) if x <= end)
    mant = (x >> (seg + 3)) & 0x0F
    return ~(sign | (seg << 4) | mant) & 0xFF


def test_encoder_matches_reference_table_exhaustive():
    xs = np.arange(-32768, 32768, dtype=np.int16)
    got = ulaw.encode_ulaw(xs)
    want = np.array([_lin2ulaw_scalar(int(v)) for v in xs], np.uint8)
    np.testing.assert_array_equal(got, want)


def test_device_decoder_bit_equal_reference_all_bytes():
    import jax.numpy as jnp

    bs = np.arange(256, dtype=np.uint8)
    ref = ulaw.decode_ulaw_reference(bs).astype(np.float32) / 32768.0
    dev = np.asarray(ulaw.decode_ulaw_device(jnp.asarray(bs)))
    np.testing.assert_array_equal(dev, ref)


def test_round_trip_quantization_bound():
    """decode(encode(x)) error <= half the segment step everywhere; zero
    maps to zero; the decoded range is the canonical +-32124."""
    xs = np.arange(-32768, 32768, dtype=np.int16)
    dec = ulaw.decode_ulaw_reference(ulaw.encode_ulaw(xs))
    assert dec.max() == 32124 and dec.min() == -32124
    err = np.abs(dec - np.clip(xs, -32635, 32635))
    # segment step at |x| is 2^(seg+3); error bound is half a step + bias
    mag = np.minimum(np.abs(xs.astype(np.int32)), 32635) + _BIAS
    seg = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    assert (err <= (1 << (seg + 3)) // 2 + 1).all()
    assert dec[32768] == 0 or abs(int(dec[32768])) <= 4  # x=0


def test_encode_f32_matches_int16_convention():
    rng = np.random.default_rng(0)
    f = (rng.standard_normal(4096) * 0.2).clip(-1, 1).astype(np.float32)
    pcm = np.clip(f * 32768.0, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(ulaw.encode_ulaw_f32(f), ulaw.encode_ulaw(pcm))


@pytest.mark.parametrize("engine", ["exact", "continuous"])
def test_engines_accept_ulaw_chunks(engine):
    """uint8 mu-law chunks produce logits equal to feeding the decoded f32
    samples through the same engine — the wire format is transparent."""
    import jax.numpy as jnp

    from lsm_tpu.config import FEATURE_SETS, FrontendConfig, ReservoirConfig
    from lsm_tpu.models import reservoir as res
    from lsm_tpu.models.continuous import ContinuousKWS
    from lsm_tpu.models.streaming import StreamingKWS
    from lsm_tpu.readout.logistic import LogisticParams
    from lsm_tpu.readout.scaler import ScalerState

    fcfg = FrontendConfig()
    params = res.init_reservoir(
        ReservoirConfig(mean_weight=0.01), n_channels=fcfg.n_filters
    )
    d = len(FEATURE_SETS["original"]) * params.n_outputs
    rng = np.random.default_rng(1)
    ro = LogisticParams(
        w=jnp.asarray(rng.standard_normal((d, 12)).astype(np.float32)),
        b=jnp.zeros((12,), jnp.float32),
    )
    sc = ScalerState(mean=jnp.zeros((d,), jnp.float32),
                     scale=jnp.ones((d,), jnp.float32))
    chunk_len = 1600
    audio = (rng.standard_normal((2, chunk_len)) * 0.2).astype(np.float32)
    wire = ulaw.encode_ulaw_f32(audio)
    decoded = (
        ulaw.decode_ulaw_reference(wire).astype(np.float32) / 32768.0
    )

    def mk():
        if engine == "exact":
            return StreamingKWS(params, ro, sc, fcfg, n_streams=2)
        return ContinuousKWS(params, ro, sc, fcfg, n_streams=2,
                             chunk_len=chunk_len)

    kws_u, kws_f = mk(), mk()
    out_u = kws_u.step(wire)
    out_f = kws_f.step(decoded)
    np.testing.assert_array_equal(out_u, out_f)


def test_pipeline_accuracy_on_ulaw_audio():
    """Full batch pipeline on mu-law round-tripped hard-benchmark audio:
    the codec's ~38 dB quantization must keep the flagship config inside
    the frozen accuracy band (tests/test_accuracy_band.py)."""
    from lsm_tpu import pipeline
    from lsm_tpu.config import PipelineConfig
    from lsm_tpu.io import dataset

    audio, labels = dataset.synthetic_audio_batch_hard(
        n_per_class=30, n_classes=12, seed=42
    )
    wire = ulaw.encode_ulaw_f32(audio)
    audio_rt = (
        ulaw.decode_ulaw_reference(wire).astype(np.float32) / 32768.0
    )
    cfg = PipelineConfig(batch_size=64)
    result, ext = pipeline.run_pipeline_arrays(cfg, audio_rt, labels, mesh=None)
    assert ext.diagnostics.regime == "EDGE OF CHAOS", ext.diagnostics.regime
    assert 0.76 <= result.accuracy <= 0.90, (
        f"mu-law round-trip accuracy {result.accuracy:.4f} left the frozen "
        "band — the codec is costing accuracy"
    )
