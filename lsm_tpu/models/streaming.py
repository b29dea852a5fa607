"""Streaming keyword spotting (BASELINE.json configs[4]).

Real-time KWS evaluates a trailing 1 s analysis window every `hop_chunks`
audio chunks. The stream state is an on-device audio ring buffer per
stream; each evaluation runs the SAME jitted end-to-end function as the
batch path (featurize -> reservoir -> features -> readout), so streaming
predictions are bit-identical to offline predictions on the same window —
there is no approximate "streaming feature" variant to validate separately.

Latency budget: one window evaluation for a small stream batch is a few ms
on a v5e chip (dominated by the 400-step LIF scan), well inside a typical
10-100 ms hop. The sequence axis stays on-chip via lax.scan (SURVEY.md
section 5.7): longer audio just means more scan steps, O(1) state.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lsm_tpu.config import FEATURE_SETS, FrontendConfig
from lsm_tpu.models import reservoir as res
from lsm_tpu.models.frontend import featurize_batch
from lsm_tpu.readout import logistic, scaler


@functools.partial(jax.jit, static_argnames=("fcfg", "keys"), donate_argnums=(0,))
def _push_chunk(buffer: jax.Array, chunk: jax.Array, fcfg: FrontendConfig, keys) -> jax.Array:
    del fcfg, keys
    n = chunk.shape[-1]
    return jnp.concatenate([buffer[:, n:], chunk], axis=-1)


class StreamingKWS:
    """Stateful sliding-window keyword spotter over B parallel streams."""

    def __init__(
        self,
        params: res.ReservoirParams,
        readout: logistic.LogisticParams,
        scaler_state: scaler.ScalerState,
        fcfg: FrontendConfig,
        feature_set: str = "original",
        n_streams: int = 1,
    ):
        self.params = params
        self.readout = readout
        self.scaler_state = scaler_state
        self.fcfg = fcfg
        self.keys = tuple(FEATURE_SETS[feature_set])
        self.n_streams = n_streams
        self.buffer = jnp.zeros((n_streams, fcfg.num_samples), jnp.float32)

        keys = self.keys

        # params rides as a jit ARGUMENT (it is a registered-pytree
        # dataclass), never a closure: closed-over weights become HLO
        # literal constants and a large reservoir overflows the remote
        # compile service (CLAUDE.md).
        @jax.jit
        def _evaluate(p, buffer, w, b, mean, scale):
            spikes = featurize_batch(buffer, fcfg)
            feats = res.extract_features_batch(p, spikes, keys)
            feats = (feats - mean) / scale
            return feats @ w + b

        self._evaluate = _evaluate

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _step(p, buffer, chunk, w, b, mean, scale):
            if chunk.dtype == jnp.int16:
                # PCM16 ingest: convert on device with the decoders'
                # exact scaling (io/wav.py:59, native/wavio.cpp) — the
                # host->device transfer moves half the bytes.
                chunk = chunk.astype(jnp.float32) / 32768.0
            n = chunk.shape[-1]
            buffer = jnp.concatenate([buffer[:, n:], chunk], axis=-1)
            return buffer, _evaluate(p, buffer, w, b, mean, scale)

        self._step = _step

    def _normalize_chunk(self, chunk: np.ndarray) -> np.ndarray:
        """Shared ingest policy for push()/step(): shape and dtype.

        float inputs are cast to f32 ([-1, 1] samples); int16 stays int16
        (the jitted step converts with the decoders' exact /32768 on
        device); other integer dtypes are rejected rather than silently
        cast unscaled. A chunk longer than the analysis window would
        silently grow the buffer (changing the evaluated window and
        recompiling everything downstream), so it is rejected too."""
        chunk = np.asarray(chunk)
        if chunk.ndim == 1:
            chunk = chunk[None, :]
        if chunk.shape[0] != self.n_streams:
            raise ValueError(
                f"expected {self.n_streams} streams, got {chunk.shape[0]}"
            )
        if chunk.shape[-1] > self.fcfg.num_samples:
            raise ValueError(
                f"chunk length {chunk.shape[-1]} exceeds the analysis "
                f"window ({self.fcfg.num_samples} samples)"
            )
        if chunk.dtype == np.int16:
            return chunk
        if np.issubdtype(chunk.dtype, np.integer):
            raise TypeError(
                f"integer PCM chunks must be int16, got {chunk.dtype}"
            )
        return chunk.astype(np.float32)

    def push(self, chunk: np.ndarray) -> None:
        """Append a (n_streams, chunk_len) audio chunk to the ring buffer.

        Same ingest contract as step(): f32 samples or int16 PCM (scaled
        by the exact decoder convention on the host here)."""
        chunk = self._normalize_chunk(chunk)
        if chunk.dtype == np.int16:
            chunk = chunk.astype(np.float32) / 32768.0
        self.buffer = _push_chunk(
            self.buffer, jnp.asarray(chunk), self.fcfg, self.keys
        )

    def logits(self) -> np.ndarray:
        """Evaluate the current trailing window. (n_streams, n_classes)."""
        out = self._evaluate(
            self.params,
            self.buffer,
            self.readout.w,
            self.readout.b,
            self.scaler_state.mean,
            self.scaler_state.scale,
        )
        return np.asarray(out)

    def predict(self) -> np.ndarray:
        return np.argmax(self.logits(), axis=-1)

    def step(self, chunk: np.ndarray) -> np.ndarray:
        """push + logits fused into ONE dispatch: (n_streams, n_classes).

        Semantically identical to push(chunk) then logits(), but the
        buffer roll and the window evaluation compile into a single
        program — one device dispatch per chunk instead of two, which
        matters when each dispatch carries a relay round-trip.

        Accepts float32 samples in [-1, 1] or raw int16 PCM; PCM chunks
        transfer half the bytes and convert on device with the exact
        decoder scaling (pcm / 32768), so the two forms are bit-equal."""
        chunk = self._normalize_chunk(chunk)
        self.buffer, out = self._step(
            self.params,
            self.buffer,
            jnp.asarray(chunk),
            self.readout.w,
            self.readout.b,
            self.scaler_state.mean,
            self.scaler_state.scale,
        )
        return np.asarray(out)

    def reset(self, stream_idx: Optional[int] = None) -> None:
        if stream_idx is None:
            self.buffer = jnp.zeros_like(self.buffer)
        else:
            self.buffer = self.buffer.at[stream_idx].set(0.0)
