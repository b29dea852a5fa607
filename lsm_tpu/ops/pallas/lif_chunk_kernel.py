"""Fused Pallas kernel for ONE continuous-mode chunk of LIF steps.

The continuous streaming mode (models/continuous.py) runs T_c (~40) LIF
steps per hop with CARRIED state. The XLA lax.scan formulation round-trips
the (B, N_pad) membrane/refractory/spike carry through HBM every step —
~110 MB per step at 4096 streams, the dominant device cost of the hop.
This kernel is the chunked sibling of ops/pallas/lif_kernel.py: states
enter as inputs, stay VMEM-resident for the whole chunk, and leave as
outputs; the chunk's SEGMENT SUMMARY (reservoir.segment_summary fields,
segment-relative times) and per-rate-window counts are accumulated
in-kernel, so the (T_c, B, no) output raster never exists anywhere. HBM
traffic per tile = input spikes + state in/out + O(B*no) stats.

Matches the XLA chunk path bit-for-bit on dyadic weights
(tests/test_continuous.py::test_chunk_kernel_matches_xla) — same bf16
matmul operands, f32 state, identical op order.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsm_tpu.models.reservoir import ReservoirParams

_B_TILE = 256
_LANE = 128


def _round_up(x: int, m: int = _LANE) -> int:
    return -(-x // m) * m


def _lif_chunk_kernel(
    xs_ref,        # (T_c, B_t, C_pad) uint8
    w_rec_ref,     # (N_pad, N_pad) bf16
    w_in_ref,      # (C_pad, N_pad) bf16
    leak_ref,      # (8, N_pad) f32 (row 0 = 1 - leak)
    v_in_ref, refrac_in_ref, s_prev_in_ref,    # (B_t, N_pad) f32
    v_ref, refrac_ref, s_prev_ref,             # (B_t, N_pad) f32 out
    counts_ref, sum_t_ref, sum_t2_ref, first_ref, last_ref,
    n_isi_ref, sum_isi_ref, sum_isi2_ref, bursts_ref,   # (B_t, no_pad)
    win_ref,       # (B_t, n_new_win, no_pad)
    prev_t_s, c_cur_s,                         # scratch (B_t, no_pad)
    *, threshold, refractory, burst_isi_max, n_outputs_pad, win_len, n_new_win,
):
    no = n_outputs_pad

    v_ref[:] = v_in_ref[:]
    refrac_ref[:] = refrac_in_ref[:]
    s_prev_ref[:] = s_prev_in_ref[:]
    counts_ref[:] = jnp.zeros_like(counts_ref)
    sum_t_ref[:] = jnp.zeros_like(sum_t_ref)
    sum_t2_ref[:] = jnp.zeros_like(sum_t2_ref)
    first_ref[:] = jnp.full_like(first_ref, jnp.inf)
    last_ref[:] = jnp.full_like(last_ref, -1.0)
    n_isi_ref[:] = jnp.zeros_like(n_isi_ref)
    sum_isi_ref[:] = jnp.zeros_like(sum_isi_ref)
    sum_isi2_ref[:] = jnp.zeros_like(sum_isi2_ref)
    bursts_ref[:] = jnp.zeros_like(bursts_ref)
    # Segment-relative ISI state: no previous spike at chunk start (the
    # cross-chunk interval is reconstructed by fold_segment_stats).
    prev_t_s[:] = jnp.full_like(prev_t_s, -1.0)
    c_cur_s[:] = jnp.zeros_like(c_cur_s)

    leak_keep = leak_ref[0, :][None, :]

    def step(t, _):
        x_t = xs_ref[t].astype(jnp.int32).astype(jnp.bfloat16)
        drive = (
            jnp.dot(s_prev_ref[:].astype(jnp.bfloat16), w_rec_ref[:],
                    preferred_element_type=jnp.float32)
            + jnp.dot(x_t, w_in_ref[:], preferred_element_type=jnp.float32)
        )
        active = refrac_ref[:] == 0.0
        v_new = jnp.where(active, v_ref[:] * leak_keep + drive, 0.0)
        spike = jnp.logical_and(v_new >= threshold, active)
        v_ref[:] = jnp.where(spike, 0.0, v_new)
        refrac_ref[:] = jnp.where(
            spike, float(refractory), jnp.maximum(refrac_ref[:] - 1.0, 0.0)
        )
        sf = spike.astype(jnp.float32)
        s_prev_ref[:] = sf

        so = sf[:, :no]
        tf = t.astype(jnp.float32)
        counts_ref[:] = counts_ref[:] + so
        sum_t_ref[:] = sum_t_ref[:] + so * tf
        sum_t2_ref[:] = sum_t2_ref[:] + so * tf * tf
        first_ref[:] = jnp.minimum(
            first_ref[:], jnp.where(so > 0, tf, jnp.inf)
        )
        last_ref[:] = jnp.maximum(last_ref[:], jnp.where(so > 0, tf, -1.0))

        prev_t = prev_t_s[:]
        isi = tf - prev_t
        isi_event = jnp.logical_and(so > 0, prev_t >= 0.0)
        isi_f = jnp.where(isi_event, isi, 0.0)
        n_isi_ref[:] = n_isi_ref[:] + isi_event.astype(jnp.float32)
        sum_isi_ref[:] = sum_isi_ref[:] + isi_f
        sum_isi2_ref[:] = sum_isi2_ref[:] + isi_f * isi_f
        bursts_ref[:] = bursts_ref[:] + jnp.logical_and(
            isi_event, isi <= float(burst_isi_max)
        ).astype(jnp.float32)
        prev_t_s[:] = jnp.where(so > 0, tf, prev_t)

        c_cur_s[:] = c_cur_s[:] + so
        return 0

    # Rate-window boundaries are STATIC (t_c % win_len == 0 is enforced by
    # the caller), so the flush indexes win_ref statically per window.
    for w in range(n_new_win):
        jax.lax.fori_loop(w * win_len, (w + 1) * win_len, step, 0)
        win_ref[:, w, :] = c_cur_s[:]
        c_cur_s[:] = jnp.zeros_like(c_cur_s)


def chunk_kernel_ok(params: ReservoirParams, t_c: int, batch=None) -> bool:
    """VMEM-fit gate (mirrors reservoir._pallas_lif_ok's budget).

    With more than one batch tile on the grid, Mosaic double-buffers
    every grid-varying block (the input spikes tile and each state/stat
    in-out plane), so those per-tile terms count twice — the same
    pipeline model the sparse estimator validated against a real 181 MB
    compile failure (sparse_lif_chunk_kernel._vmem_estimate).
    `batch=None` conservatively assumes a multi-tile grid."""
    n_pad = params.w_rec.shape[0]
    c_pad = params.w_in.shape[0]
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    grid = 2 if batch is None else -(-batch // _B_TILE)
    mult = 1 if grid <= 1 else 2
    invariant = 2 * n_pad * n_pad + 2 * c_pad * n_pad  # w_rec + w_in bf16
    per_tile = (
        t_c * _B_TILE * c_pad             # input tile uint8
        + 12 * _B_TILE * n_pad * 4        # states in+out + stats headroom
    )
    return invariant + mult * per_tile < 48 * 1024 * 1024


def simulate_chunk_pallas(
    params: ReservoirParams,
    spikes_chunk: jnp.ndarray,     # (B, C_pad, T_c) uint8/bool
    v: jnp.ndarray,                # (B, N_pad) f32
    refrac: jnp.ndarray,           # (B, N_pad) f32
    s_prev: jnp.ndarray,           # (B, N_pad) f32
    win_len: int,
    n_new_win: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
    """One carried-state chunk. Returns (v, refrac, s_prev, seg_stats,
    win_counts (B, n_new_win, no)) — seg_stats fields exactly match
    reservoir.segment_summary (segment-relative times)."""
    B, c_pad, T = spikes_chunk.shape
    n_pad = params.w_rec.shape[0]
    no_pad = _round_up(params.n_outputs)
    no = params.n_outputs
    assert T == win_len * n_new_win

    x = spikes_chunk.astype(jnp.uint8)
    pad_b = (-B) % _B_TILE
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        pad2 = ((0, pad_b), (0, 0))
        v = jnp.pad(v, pad2)
        refrac = jnp.pad(refrac, pad2)
        s_prev = jnp.pad(s_prev, pad2)
    bp = B + pad_b
    xs = x.transpose(2, 0, 1)                              # (T, B, C_pad)

    leak_row = jnp.zeros((8, n_pad), jnp.float32).at[0].set(1.0 - params.leak)

    state_shape = jax.ShapeDtypeStruct((bp, n_pad), jnp.float32)
    stat_shape = jax.ShapeDtypeStruct((bp, no_pad), jnp.float32)
    out_shapes = (
        [state_shape] * 3
        + [stat_shape] * 9
        + [jax.ShapeDtypeStruct((bp, n_new_win, no_pad), jnp.float32)]
    )
    state_spec = pl.BlockSpec((_B_TILE, n_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((_B_TILE, no_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_specs = (
        [state_spec] * 3
        + [stat_spec] * 9
        + [pl.BlockSpec((_B_TILE, n_new_win, no_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)]
    )

    kernel = functools.partial(
        _lif_chunk_kernel,
        threshold=float(params.threshold),
        refractory=int(params.refractory),
        burst_isi_max=int(params.burst_isi_max),
        n_outputs_pad=no_pad,
        win_len=win_len,
        n_new_win=n_new_win,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(bp // _B_TILE,),
        in_specs=[
            pl.BlockSpec((T, _B_TILE, c_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((_B_TILE, no_pad), jnp.float32),   # prev_t
            pltpu.VMEM((_B_TILE, no_pad), jnp.float32),   # current-window counts
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        xs,
        params.w_rec.astype(jnp.bfloat16),
        params.w_in.astype(jnp.bfloat16),
        leak_row,
        v, refrac, s_prev,
    )

    v_out, refrac_out, s_prev_out = outs[0][:B], outs[1][:B], outs[2][:B]
    (counts, sum_t, sum_t2, first, last, n_isi, sum_isi, sum_isi2,
     bursts) = [o[:B, :no] for o in outs[3:12]]
    win_counts = outs[12][:B, :, :no]
    seg = dict(
        counts=counts, sum_t=sum_t, sum_t2=sum_t2, first=first, last=last,
        n_isi=n_isi, sum_isi=sum_isi, sum_isi2=sum_isi2, bursts=bursts,
    )
    return v_out, refrac_out, s_prev_out, seg, win_counts
