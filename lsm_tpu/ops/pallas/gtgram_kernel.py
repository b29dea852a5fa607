"""Pallas TPU kernel for the block-IIR gammatone filterbank (phase 2).

Two-phase design (the round-2 rework that replaced the retired sequential
kernel):

  Phase 1 (XLA, `gammatone.gtgram_state_energy`): the exact f32 state
  recurrence, batch-major so every broadcast is layout-native, emitting per
  sub-block only sq = 2*sum(u v) + sum(v^2) — the full energy contribution
  of the IIR state (v = state ring-down response), exactly expanded from
  sum (u+v)^2. O(B*C) per step instead of the full-rate signal.

  Phase 2 (this kernel): with the state energy folded into sq, each
  sub-block is INDEPENDENT and needs only the input response:

      e_k = sum_m (W_yx^T x_k)_m^2 + sq_k          (C, B_t)

  One MXU dot + a VPU square-reduce per sub-block, VMEM-resident, grid
  parallel over (batch tiles x sub-block chunks): Mosaic pipelines block
  DMA against compute, and the (B, g, C) filtered response that the XLA
  path materializes to HBM every step (~20 GB per 2400 utterances — its
  measured bottleneck) never leaves VMEM.

Why not compute the state terms in-kernel (the retired design): a
(g, C) * (C, B_t) broadcast multiply needs a lane->sublane relayout of the
coefficient operand, measured at ~178 ms per 2400 utterances — 5x the cost
of everything else combined. The algebraic split moves those terms into
phase 1 where the batch-major layout makes them native VPU work.

Numerics: the split is exact in real arithmetic; in f32 the separately
rounded sq can make a near-zero energy slightly negative (u ~ -v at
silence), so the kernel clamps at 0 before the sqrt epilogue. Parity vs
the XLA path on TPU hardware: median rel err 8.1e-5, p99 8.2e-4 (the
phase-1 drive matmul runs 3-pass bf16 HIGH — see gtgram_state_energy —
and the phase-2 input response runs at the Mosaic f32 default);
test_pallas_kernels.py polices rtol 5e-3 in interpret mode.

Data layout: batch on the LANE axis (B_t = 128); sub-blocks lead so chunk
indexing is on untiled dimension 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsm_tpu.ops.gammatone import (
    _block_iir_matrices,
    gtgram_state_energy,
    gtgram_strides,
)

_B_TILE = 128
_CHUNK = 4   # sub-blocks per grid cell


@functools.lru_cache(maxsize=None)
def _input_response_matrix(fs: float, channels: int, f_min: float, g: int):
    m_yx, _, _, _ = _block_iir_matrices(fs, channels, f_min, g)
    C = channels
    # w_yx_t[m*C + c, l] = m_yx[c, l, m]: output rows (m, c), contract l.
    return np.ascontiguousarray(np.transpose(m_yx, (2, 0, 1)).reshape(g * C, g))


def _energy_kernel(x_ref, sq_ref, wyx_ref, out_ref, *, g, channels):
    chunk = out_ref.shape[0]
    b_t = x_ref.shape[-1]
    for k in range(chunk):
        u = jnp.dot(
            wyx_ref[:], x_ref[k], preferred_element_type=jnp.float32
        ).reshape(g, channels, b_t)
        e = jnp.sum(u * u, axis=0) + sq_ref[k]
        out_ref[k] = jnp.maximum(e, 0.0)


def gtgram_energy_pallas(
    blocks: jnp.ndarray,          # (n_sub, g, B) sub-block-major waveform
    sq: jnp.ndarray,              # (n_sub, C, B) from gtgram_state_energy
    fs: float,
    channels: int,
    f_min: float,
    g: int,
) -> jnp.ndarray:
    """Per-sub-block energies in the kernel-native (n_sub, C, B) f32
    layout (batch on lanes — callers epilogue in this layout and transpose
    only the final windowed result). Requires B % 128 == 0 and
    n_sub % CHUNK == 0 (see pallas_supported / gtgram_pallas padding)."""
    n_sub, g_, B = blocks.shape
    if g_ != g or n_sub % _CHUNK or B % _B_TILE:
        raise ValueError(f"unsupported geometry n_sub={n_sub} g={g} B={B}")

    w_yx_t = _input_response_matrix(fs, channels, f_min, g)
    grid = (B // _B_TILE, n_sub // _CHUNK)

    out = pl.pallas_call(
        functools.partial(_energy_kernel, g=g, channels=channels),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK, g, _B_TILE), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, channels, _B_TILE), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g * channels, g), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_CHUNK, channels, _B_TILE), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_sub, channels, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_sub * g * channels * (g + 1) * B,
            bytes_accessed=blocks.size * 4 + sq.size * 4 + sq.size * 4,
            transcendentals=0,
        ),
    )(blocks, sq, jnp.asarray(w_yx_t))
    return out                            # (n_sub, C, B) — kernel layout


def gtgram_pallas(
    wave: jnp.ndarray,
    fs: float,
    window_time: float,
    hop_time: float,
    channels: int,
    f_min: float,
) -> jnp.ndarray:
    """Drop-in for gtgram_iir: (B, S) -> (B, C, n_cols).

    Phase 1 (XLA exact state-energy scan) + phase 2 (parallel VMEM input-
    response kernel) + the same windowed-energy epilogue as the XLA path.
    """
    B, S = wave.shape
    nwin, hop, n_cols = gtgram_strides(fs, window_time, hop_time, S)
    g = math.gcd(hop, nwin)
    n_sub = -(-S // g)
    # Pad the time axis so n_sub is a CHUNK multiple (padding only affects
    # windows beyond n_cols, discarded) and the batch to the lane tile.
    n_sub_pad = -(-n_sub // _CHUNK) * _CHUNK
    pad_t = n_sub_pad * g - S
    if pad_t:
        wave = jnp.pad(wave, ((0, 0), (0, pad_t)))
    pad_b = (-B) % _B_TILE
    if pad_b:
        wave = jnp.pad(wave, ((0, pad_b), (0, 0)))
    bp = B + pad_b

    stacked = wave.reshape(bp, n_sub_pad, g)
    blocks_bm = stacked.transpose(1, 0, 2)        # (n_sub, B, g) for phase 1
    blocks_gm = stacked.transpose(1, 2, 0)        # (n_sub, g, B) for phase 2

    _, sq = gtgram_state_energy(blocks_bm, fs, channels, f_min, g)
    sub_energy = gtgram_energy_pallas(blocks_gm, sq, fs, channels, f_min, g)

    # Windowed-energy epilogue as ONE 0/1-matrix contraction on the
    # kernel's native (n_sub, C, B) layout. The index-gather formulation
    # (sub_energy[..., starts + taps].sum(-1)) re-reads each sub-block
    # energy w_per (=5) times from HBM (~1.2 GB at B=2400) and needs a
    # 245 MB minor-dim transpose first; this reads it once and the MXU
    # does the (exactly-representable) 0/1 accumulation. Measured ~3 ms
    # faster end-to-end.
    w_per = nwin // g
    h_per = hop // g
    # gtgram_strides keeps every window inside the signal, so no A row in
    # the zero-padded tail [n_sub, n_sub_pad) is ever 1 — load-bearing:
    # those sub-blocks carry NONZERO ring-down state energy (sq > 0 after
    # the signal ends) that must not leak into the final frames.
    assert (n_cols - 1) * h_per + w_per <= n_sub, (n_cols, h_per, w_per, n_sub)
    a_win = np.zeros((n_sub_pad, n_cols), np.float32)
    for n in range(n_cols):
        a_win[n * h_per : n * h_per + w_per, n] = 1.0
    win_energy = jax.lax.dot_general(
        sub_energy, jnp.asarray(a_win),
        (((0,), (0,)), ((), ())),          # contract k -> (C, B, n_cols)
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.sqrt(jnp.maximum(win_energy, 0.0) / nwin)
    return out.transpose(1, 0, 2)[:B]      # (B, C, n_cols)


def chunk_supported(chunk_len: int, g: int) -> bool:
    """Geometry gate for gtgram_chunk_two_phase: the phase-2 kernel tiles
    sub-blocks in _CHUNK rows (time padding is impossible — it would
    corrupt the carried state — so non-multiples fall back to the fused
    XLA chunk scan). The batch axis pads freely inside the wrapper, so
    stream count does NOT affect dispatch: calibration (arbitrary n) and
    serving (any n) always run the same path on the same backend.

    Channel count deliberately does NOT gate (unlike pallas_supported's
    perf-motivated channels % 128): verified on the real chip that the
    chunk kernel compiles and matches the XLA scan at the same tolerance
    for C in {32, 64, 128, 256} (kernel-vs-scan energy p99 within the
    documented band at every C)."""
    return chunk_len % g == 0 and (chunk_len // g) % _CHUNK == 0


def gtgram_chunk_two_phase(
    chunk: jnp.ndarray,           # (B, chunk_len) f32 samples
    init_state: jnp.ndarray,      # (B, 8, C) carried cascade state
    fs: float,
    channels: int,
    f_min: float,
    g: int,
):
    """Streaming (state-carrying) two-phase gtgram chunk featurizer.

    The continuous-mode hop's device time is dominated by the gammatone
    chunk (profile_stages --continuous: ~3.7 ms of ~6.3 ms device at
    2400 streams) because gtgram_iir_scan's big per-step y-response
    matmul + energy epilogue is sequential over sub-blocks. This applies
    the batch two-phase split (module docstring) to a CHUNK with carried
    state: phase 1 scans only the 8-dim state + quadratic energy terms
    (10x fewer sequential flops), phase 2 computes the input-response
    energies embarrassingly parallel on the MXU.

    Exactness: chunking is exact for this implementation (same phase-1
    step per sub-block regardless of chunk boundaries — the analogue of
    gtgram_iir_scan's bit-exact continuation), while ABSOLUTE energies
    differ from gtgram_iir_scan at the documented kernel tolerance
    (p99 ~8e-4; test_pallas_kernels.py). Callers must pair it with a
    readout calibrated on the same path (fit_continuous_readout runs
    whatever path ContinuousKWS dispatches, so calibration and serving
    always match).

    Returns (final_state (B, 8, C), sub_energy (n_sub, B, C)).
    """
    B, L = chunk.shape
    n_sub = L // g
    if not chunk_supported(L, g):
        raise ValueError(
            f"unsupported chunk geometry chunk_len={L} g={g} "
            f"(need chunk_len % g == 0 and (chunk_len//g) % {_CHUNK} == 0)"
        )
    # Batch pads to the lane tile INSIDE the program (<= 127 zero streams,
    # ~1% at serving counts); time cannot pad (carried state).
    pad_b = (-B) % _B_TILE
    if pad_b:
        chunk = jnp.pad(chunk, ((0, pad_b), (0, 0)))
        init_state = jnp.pad(init_state, ((0, pad_b), (0, 0), (0, 0)))
    stacked = chunk.reshape(B + pad_b, n_sub, g)
    state, sq = gtgram_state_energy(
        stacked.transpose(1, 0, 2), fs, channels, f_min, g,
        init_state=init_state,
    )
    sub_e = gtgram_energy_pallas(
        stacked.transpose(1, 2, 0), sq, fs, channels, f_min, g
    )                                     # (n_sub, C, B)
    return state[:B], sub_e.transpose(0, 2, 1)[:, :B]


def pallas_supported(fs: float, window_time: float, hop_time: float,
                     channels: int, n_samples: int) -> bool:
    """Lane-aligned channels and the standard g geometry."""
    nwin, hop, _ = gtgram_strides(fs, window_time, hop_time, n_samples)
    g = math.gcd(hop, nwin)
    return channels % 128 == 0 and g % 8 == 0
