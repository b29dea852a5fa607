"""Pallas TPU kernel for the block-IIR gammatone filterbank.

STATUS: EXPERIMENTAL — matches the XLA path in interpret mode (tested), but
on v5e hardware it is currently ~1.6x SLOWER than the XLA block-IIR scan
(the 16 per-sub-block VPU broadcast terms dominate; the MXU dot is not the
bottleneck) and shows a small numerical anomaly near the dB floor that is
still being chased. The production default is the XLA path in
lsm_tpu.ops.gammatone.gtgram_iir; this kernel is kept as the starting point
for a revisit (plan: fold the state response into the MXU via an extended
input vector, and double-buffer sub-block DMA).

Motivation (measured on v5e): the XLA scan formulation of the block-IIR
gammatone is HBM-bound — every 80-sample block step materializes the
(B, g*C) filtered block in HBM before the energy reduction, ~200 MB of
traffic per step x 200 steps. This kernel keeps the IIR state and all block
matrices resident in VMEM for the whole waveform and writes ONLY the
per-sub-block energies: HBM traffic drops from ~40 GB to
(audio in + energies out) ~180 MB for a 2400-utterance batch.

Data layout (B_t = batch tile, g = sub-block length, C = channels):
the batch lives on the LANE axis and sub-blocks on the leading untiled
axis, so the per-step dynamic indexing is on dimension 0 (no lane-alignment
proofs needed) and every matmul has N = B_t = 128 lanes:

  x_ref    (CHUNK, g, B_t)   audio sub-blocks for this time chunk
  wyx_ref  (g*C, g)          y response to in-block input, row m*C + c
  wxs_ref  (8*C, g)          end-state response to in-block input, row s*C+c
  msy_ref  (8, g, C)         y response to initial state (VPU broadcast)
  mss_ref  (8, 8, C)         state transition (VPU broadcast), [t, s, c]
  out_ref  (CHUNK, C, B_t)   sub-block energy sums
  state    (8, C, B_t)       f32 scratch; persists across the time-chunk
                             grid axis (the TPU grid is a sequential
                             on-core loop, minormost axis fastest)

The state propagation through M_ss/M_sy runs as exact f32 VPU multiply-adds
(8 broadcast terms), so MXU operand rounding never touches the recurrent
path — the numerical hazard that bit the XLA version.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsm_tpu.ops.gammatone import _block_iir_matrices, gtgram_strides

_B_TILE = 128
_CHUNK = 8  # sub-blocks per grid step along time


@functools.lru_cache(maxsize=None)
def _kernel_matrices(fs: float, channels: int, f_min: float, g: int):
    m_yx, m_sy, m_xs, m_ss = _block_iir_matrices(fs, channels, f_min, g)
    C = channels
    # Row-major (m*C + c, l): output rows (m, c), contraction over l:
    # w_yx_t[m*C + c, l] = m_yx[c, l, m].
    w_yx_t = np.ascontiguousarray(
        np.transpose(m_yx, (2, 0, 1)).reshape(g * C, g)
    )
    w_xs_t = np.ascontiguousarray(
        np.transpose(m_xs, (2, 0, 1)).reshape(8 * C, g)
    )
    m_sy_t = np.ascontiguousarray(m_sy.transpose(1, 2, 0))  # (s:8, m:g, C)
    m_ss_r = np.ascontiguousarray(m_ss.transpose(1, 2, 0))  # (t:8, s:8, C)
    return w_yx_t, w_xs_t, m_sy_t, m_ss_r


def _gtgram_kernel(
    x_ref, wyx_ref, wxs_ref, msy_ref, mss_ref, out_ref, state, y_acc, s_acc,
    *, g, channels
):
    b_t = x_ref.shape[-1]
    chunk = out_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    def body(k, _):
        x_blk = x_ref[k]                                       # (g, B_t)
        # Accumulate into scratch refs rather than SSA-chaining 8 updates:
        # Mosaic allocates every live intermediate on the VMEM stack, and 8
        # chained copies of the (g, C, B_t) block blow the 16 MB budget.
        # The y dot runs with bf16 operands (full-rate MXU): it feeds only
        # the windowed energy, where a 0.4% operand rounding is harmless;
        # the state path stays exact f32.
        y_acc[:] = jnp.dot(
            wyx_ref[:].astype(jnp.bfloat16),
            x_blk.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(g, channels, b_t)
        s_acc[:] = jnp.dot(
            wxs_ref[:], x_blk, preferred_element_type=jnp.float32
        ).reshape(8, channels, b_t)
        for s in range(8):
            col = state[s][None, :, :]                         # (1, C, B_t)
            y_acc[:] = y_acc[:] + msy_ref[s][:, :, None] * col
            s_acc[:] = s_acc[:] + mss_ref[s][:, :, None] * col
        state[:] = s_acc[:]
        yv = y_acc[:]
        out_ref[k] = jnp.sum(yv * yv, axis=0)                  # (C, B_t)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def gtgram_energy_pallas(
    wave: jnp.ndarray, fs: float, channels: int, f_min: float, g: int
) -> jnp.ndarray:
    """(B, S) f32 -> per-sub-block energies (B, C, n_sub) f32. S % g == 0,
    (S/g) % CHUNK == 0."""
    B, S = wave.shape
    n_sub = S // g
    if n_sub % _CHUNK:
        raise ValueError(f"n_sub={n_sub} not a multiple of CHUNK={_CHUNK}")
    pad_b = (-B) % _B_TILE
    if pad_b:
        wave = jnp.pad(wave, ((0, pad_b), (0, 0)))
    bp = B + pad_b

    # (n_sub, g, B): sub-blocks leading, batch on lanes.
    x = wave.reshape(bp, n_sub, g).transpose(1, 2, 0)

    w_yx_t, w_xs_t, m_sy_t, m_ss_r = _kernel_matrices(fs, channels, f_min, g)
    grid = (bp // _B_TILE, n_sub // _CHUNK)

    out = pl.pallas_call(
        functools.partial(_gtgram_kernel, g=g, channels=channels),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK, g, _B_TILE), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g * channels, g), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * channels, g), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, g, channels), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, channels), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_CHUNK, channels, _B_TILE), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_sub, channels, bp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, channels, _B_TILE), jnp.float32),   # state
            pltpu.VMEM((g, channels, _B_TILE), jnp.float32),   # y accumulator
            pltpu.VMEM((8, channels, _B_TILE), jnp.float32),   # state acc
        ],
    )(
        x,
        jnp.asarray(w_yx_t),
        jnp.asarray(w_xs_t),
        jnp.asarray(m_sy_t),
        jnp.asarray(m_ss_r),
    )
    # (n_sub, C, bp) -> (B, C, n_sub)
    return out.transpose(2, 1, 0)[:B]


def gtgram_pallas(
    wave: jnp.ndarray,
    fs: float,
    window_time: float,
    hop_time: float,
    channels: int,
    f_min: float,
) -> jnp.ndarray:
    """Drop-in for gtgram_iir using the fused VMEM-resident kernel."""
    B, S = wave.shape
    nwin, hop, n_cols = gtgram_strides(fs, window_time, hop_time, S)
    g = math.gcd(hop, nwin)
    n_sub = -(-S // g)
    # Pad the time axis so n_sub is a CHUNK multiple (padding only affects
    # windows beyond n_cols, which are discarded).
    n_sub_pad = -(-n_sub // _CHUNK) * _CHUNK
    pad = n_sub_pad * g - S
    if pad:
        wave = jnp.pad(wave, ((0, 0), (0, pad)))

    sub_energy = gtgram_energy_pallas(wave, fs, channels, f_min, g)

    w_per = nwin // g
    h_per = hop // g
    starts = np.arange(n_cols) * h_per
    idx = starts[:, None] + np.arange(w_per)[None, :]
    win_energy = sub_energy[..., idx].sum(-1)
    return jnp.sqrt(win_energy / nwin)


def pallas_supported(fs: float, window_time: float, hop_time: float,
                     channels: int, n_samples: int) -> bool:
    """The kernel requires lane-aligned channels and the standard geometry."""
    nwin, hop, _ = gtgram_strides(fs, window_time, hop_time, n_samples)
    g = math.gcd(hop, nwin)
    return channels % 128 == 0 and g % 8 == 0
