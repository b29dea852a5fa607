"""G.711 mu-law 8-bit PCM: host encoder + on-device decoder.

The streaming serving paths are H2D-ingest-bound at high stream counts
(docs/VALIDATION.md "Streaming serving ingest"): at 4096 parallel 100 ms
streams a float32 chunk is ~26 MB/step, int16 PCM halves it, and mu-law
halves it again to ~6.5 MB — one byte per sample, decoded to f32 inside
the jitted step on the VPU (a handful of elementwise integer ops, fully
fused into the featurizer program). mu-law is also what telephony
actually ships (G.711/PCMU, 8 kHz..16 kHz deployments), so accepting it
natively removes a host-side transcode in exactly the serving scenario
the streaming engines target.

Convention: the CCITT reference tables (the same ones behind audioop /
sox "mu-law"): encode clips to +-32635, bias 0x84=132, 8 exponent
segments; decode returns 16-bit-range integers (+-32124 max) which the
engines scale by the decoders' exact /32768 (io/wav.py PCM16 convention,
models/streaming.py int16 ingest). Quantization SNR for speech is
~38 dB; the measured end-to-end accuracy cost on the frozen hard
benchmark is zero (tests/test_ulaw.py drives the full pipeline on
mu-law-round-tripped audio).

Reference counterpart: none (the reference is a batch pipeline over
decoded WAV files; this serves its create_dataset.py:45 audio contract
over a compressed wire format).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_BIAS = 0x84        # 132, the CCITT segment bias
_CLIP = 32635


def encode_ulaw(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 mu-law (vectorized host encoder).

    For f32 input in [-1, 1] use `encode_ulaw_f32`. Matches the CCITT
    reference encoder (audioop.lin2ulaw) byte-for-byte on all 65536
    int16 values (tests/test_ulaw.py pins the exhaustive table).
    """
    x = np.asarray(pcm)
    if x.dtype != np.int16:
        raise TypeError(f"encode_ulaw expects int16 PCM, got {x.dtype}")
    x = x.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    # exponent = highest set bit of mag in [7..14] minus 7
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant)).astype(np.uint8)


def encode_ulaw_f32(audio: np.ndarray) -> np.ndarray:
    """f32 samples in [-1, 1] -> uint8 mu-law via the int16 wire
    convention (io/wav.to_pcm16_wire — the ONE definition of the host
    f32->int16 quantization, so the mu-law wire and the PCM16 wire
    cannot drift apart)."""
    from lsm_tpu.io.wav import to_pcm16_wire

    return encode_ulaw(to_pcm16_wire(audio))


def decode_ulaw_reference(ulaw: np.ndarray) -> np.ndarray:
    """uint8 mu-law -> int16-range int32 (NumPy oracle for the device op)."""
    u = (~np.asarray(ulaw, np.uint8)).astype(np.int32) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _BIAS) << exp) - _BIAS
    return np.where(sign != 0, -mag, mag)


def decode_ulaw_device(ulaw: jnp.ndarray) -> jnp.ndarray:
    """uint8 mu-law -> f32 samples (jit-composable; the engines' ingest).

    Bit-equal to decode_ulaw_reference / 32768: integer ops on i32 lanes
    (VPU), one final f32 scale — fuses into the step program, so mu-law
    ingest costs no extra dispatch.
    """
    u = (~ulaw.astype(jnp.int32)) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _BIAS) << exp) - _BIAS
    lin = jnp.where(u & 0x80, -mag, mag)
    return lin.astype(jnp.float32) / 32768.0
