"""Fused Pallas kernel for ONE continuous-mode chunk of BLOCK-SPARSE LIF.

The chunked sibling of ops/pallas/sparse_lif_kernel.py, playing the same
role for scaled (10k-neuron) reservoirs that lif_chunk_kernel.py plays for
the flagship dense one: carried membrane/refractory/spike state enters as
kernel I/O in (nb, B_t, 128) block planes, the block-sparse weights and
all state stay VMEM-resident for the whole chunk, and the chunk's segment
summary (reservoir.segment_summary fields, segment-relative times) plus
per-rate-window counts accumulate in-kernel. The XLA alternative
re-streams the gathered spike planes and the whole carry through HBM on
every one of the chunk's ~40 steps.

Bit-equal to the XLA sparse chunk path (models/continuous.py fallback) on
dyadic weights — tests/test_continuous.py::test_sparse_chunk_kernel_matches_xla.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsm_tpu.models.sparse import BLOCK, SparseReservoirParams

_LANE = 128


def _round_up(x: int, m: int = _LANE) -> int:
    return -(-x // m) * m


def _sparse_chunk_kernel(
    src_idx_ref,   # SMEM (nb, S) int32
    xs_ref,        # (T_c, B_t, C_pad) uint8
    w_blocks_ref,  # (nb, S*128, 128) bf16
    w_in_ref,      # (nb, C_pad, 128) bf16
    leak_ref,      # (nb, 8, 128) f32 (row 0 = 1 - leak)
    v_in_ref, refrac_in_ref, s_in_ref,         # (nb, B_t, 128) f32
    v_ref, refrac_ref, s_out_ref,              # (nb, B_t, 128) f32 out
    counts_ref, sum_t_ref, sum_t2_ref, first_ref, last_ref,
    n_isi_ref, sum_isi_ref, sum_isi2_ref, bursts_ref,   # (B_t, no_pad)
    win_ref,       # (B_t, n_new_win, no_pad)
    s_bufs, x_s, so_s, prev_t_s, c_cur_s,      # scratch
    *, threshold, refractory, burst_isi_max, win_len, n_new_win,
    n_out_blocks, S,
):
    nb = w_blocks_ref.shape[0]
    t_total = xs_ref.shape[0]

    v_ref[:] = v_in_ref[:]
    refrac_ref[:] = refrac_in_ref[:]
    # Carried spike plane seeds buffer 0 (read at t=0, rd = 0).
    s_bufs[0] = s_in_ref[:].astype(jnp.bfloat16)
    prev_t_s[:] = jnp.full_like(prev_t_s, -1.0)
    c_cur_s[:] = jnp.zeros_like(c_cur_s)
    counts_ref[:] = jnp.zeros_like(counts_ref)
    sum_t_ref[:] = jnp.zeros_like(sum_t_ref)
    sum_t2_ref[:] = jnp.zeros_like(sum_t2_ref)
    first_ref[:] = jnp.full_like(first_ref, jnp.inf)
    last_ref[:] = jnp.full_like(last_ref, -1.0)
    n_isi_ref[:] = jnp.zeros_like(n_isi_ref)
    sum_isi_ref[:] = jnp.zeros_like(sum_isi_ref)
    sum_isi2_ref[:] = jnp.zeros_like(sum_isi2_ref)
    bursts_ref[:] = jnp.zeros_like(bursts_ref)

    def block_update(j, rd, wr, static_out_slot):
        drive = jnp.dot(
            x_s[:], w_in_ref[j], preferred_element_type=jnp.float32
        )
        for s in range(S):
            drive += jnp.dot(
                s_bufs[rd, src_idx_ref[j, s]],
                w_blocks_ref[j, s * BLOCK : (s + 1) * BLOCK, :],
                preferred_element_type=jnp.float32,
            )
        v = v_ref[j]
        rf = refrac_ref[j]
        leak_keep = leak_ref[j, 0, :][None, :]
        active = rf == 0.0
        v_new = jnp.where(active, v * leak_keep + drive, 0.0)
        spike = jnp.logical_and(v_new >= threshold, active)
        v_ref[j] = jnp.where(spike, 0.0, v_new)
        refrac_ref[j] = jnp.where(
            spike, float(refractory), jnp.maximum(rf - 1.0, 0.0)
        )
        s_bufs[wr, j] = spike.astype(jnp.bfloat16)
        if static_out_slot is not None:
            so_s[:, static_out_slot * BLOCK : (static_out_slot + 1) * BLOCK] = (
                spike.astype(jnp.float32)
            )

    def step(t, _):
        rd = t % 2
        wr = 1 - rd
        x_s[:] = xs_ref[t].astype(jnp.int32).astype(jnp.bfloat16)

        for j_static in range(n_out_blocks):
            block_update(j_static, rd, wr, j_static)

        def rest(j, c):
            block_update(j, rd, wr, None)
            return c

        jax.lax.fori_loop(n_out_blocks, nb, rest, 0)

        so = so_s[:]
        tf = t.astype(jnp.float32)
        counts_ref[:] = counts_ref[:] + so
        sum_t_ref[:] = sum_t_ref[:] + so * tf
        sum_t2_ref[:] = sum_t2_ref[:] + so * tf * tf
        first_ref[:] = jnp.minimum(first_ref[:], jnp.where(so > 0, tf, jnp.inf))
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

    # Static rate-window boundaries (the caller enforces t_c % win_len == 0).
    for w in range(n_new_win):
        jax.lax.fori_loop(w * win_len, (w + 1) * win_len, step, 0)
        win_ref[:, w, :] = c_cur_s[:]
        c_cur_s[:] = jnp.zeros_like(c_cur_s)

    # Final spike plane: written by the last step at index t_total % 2.
    s_out_ref[:] = s_bufs[t_total % 2].astype(jnp.float32)


def _vmem_estimate(
    nb: int, S: int, c_pad: int, t: int, b_t: int, no_pad: int, grid: int,
    n_new_win: int = 1,
) -> int:
    """Mosaic PIPELINES grid-varying blocks: with more than one batch tile
    every per-tile input/output block is double-buffered, so those terms
    count twice. Validated against a real failure: at 10k neurons /
    b_t=256 / grid=4 this model predicts 181 MB and the compiler
    reported 'Used 181.77M of 128.00M vmem'."""
    mult = 1 if grid <= 1 else 2
    invariant = (
        nb * S * BLOCK * BLOCK * 2          # w_blocks bf16
        + nb * c_pad * BLOCK * 2            # w_in bf16
        + 2 * nb * b_t * BLOCK * 2          # spike double-buffer (scratch)
        + b_t * c_pad * 2 + 3 * b_t * no_pad * 4   # scratch planes
    )
    per_tile = (
        t * b_t * c_pad                     # xs uint8
        + 6 * nb * b_t * BLOCK * 4          # v/refrac/s in+out f32
        + (9 + n_new_win) * b_t * no_pad * 4   # stat outputs + win planes
    )
    return invariant + mult * per_tile


def pick_chunk_b_tile(
    params: SparseReservoirParams, t_c: int, c_pad: int,
    batch: Optional[int] = None,
    n_new_win: int = 1,
    vmem_budget: int = 120 * 1024 * 1024,
) -> Optional[int]:
    """Largest batch tile in {256, 128} whose kernel fits VMEM including
    the pipeline double-buffering its grid implies; None = use XLA.
    `batch=None` assumes a multi-tile grid (conservative)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    nb = params.n_neurons // BLOCK
    S = params.src_idx.shape[1]
    no_pad = _round_up(min(params.n_outputs, params.n_neurons))
    for b_t in (256, 128):
        grid = 2 if batch is None else -(-batch // b_t)
        if _vmem_estimate(
            nb, S, c_pad, t_c, b_t, no_pad, grid, n_new_win
        ) < vmem_budget:
            return b_t
    return None


def simulate_chunk_sparse_pallas(
    params: SparseReservoirParams,
    spikes_chunk: jnp.ndarray,     # (B, C_pad, T_c) uint8/bool
    v: jnp.ndarray,                # (B, N) f32
    refrac: jnp.ndarray,           # (B, N) f32
    s_prev: jnp.ndarray,           # (B, N) f32
    win_len: int,
    n_new_win: int,
    b_tile: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
    """One carried-state block-sparse chunk. Returns (v, refrac, s_prev,
    seg_stats, win_counts (B, n_new_win, no)); same contract as the dense
    simulate_chunk_pallas."""
    B, c_pad, T = spikes_chunk.shape
    n = params.n_neurons
    nb = n // BLOCK
    S = params.src_idx.shape[1]
    no_pad = _round_up(min(params.n_outputs, n))
    no = params.n_outputs
    n_out_blocks = no_pad // BLOCK
    assert T == win_len * n_new_win
    if b_tile is None:
        b_tile = pick_chunk_b_tile(params, T, c_pad, batch=B,
                                   n_new_win=n_new_win)
        if b_tile is None:
            raise ValueError("sparse reservoir too large for VMEM chunk kernel")

    x = spikes_chunk.astype(jnp.uint8)
    pad_b = (-B) % b_tile
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        pad2 = ((0, pad_b), (0, 0))
        v = jnp.pad(v, pad2)
        refrac = jnp.pad(refrac, pad2)
        s_prev = jnp.pad(s_prev, pad2)
    bp = B + pad_b
    xs = x.transpose(2, 0, 1)                                  # (T, B, C_pad)

    def to_planes(a):
        return a.reshape(bp, nb, BLOCK).transpose(1, 0, 2)     # (nb, B, 128)

    def from_planes(a):
        return a.transpose(1, 0, 2).reshape(bp, n)

    w_blocks = params.w_blocks.astype(jnp.bfloat16).reshape(nb, S * BLOCK, BLOCK)
    w_in_t = (
        params.w_in.astype(jnp.bfloat16).reshape(c_pad, nb, BLOCK)
        .transpose(1, 0, 2)
    )
    leak_p = jnp.zeros((nb, 8, BLOCK), jnp.float32).at[:, 0, :].set(
        (1.0 - params.leak).reshape(nb, BLOCK)
    )

    plane_shape = jax.ShapeDtypeStruct((nb, bp, BLOCK), jnp.float32)
    stat_shape = jax.ShapeDtypeStruct((bp, no_pad), jnp.float32)
    out_shapes = (
        [plane_shape] * 3
        + [stat_shape] * 9
        + [jax.ShapeDtypeStruct((bp, n_new_win, no_pad), jnp.float32)]
    )
    plane_spec = pl.BlockSpec((nb, b_tile, BLOCK), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((b_tile, no_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_specs = (
        [plane_spec] * 3
        + [stat_spec] * 9
        + [pl.BlockSpec((b_tile, n_new_win, no_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)]
    )

    kernel = functools.partial(
        _sparse_chunk_kernel,
        threshold=float(params.threshold),
        refractory=int(params.refractory),
        burst_isi_max=int(params.burst_isi_max),
        win_len=win_len,
        n_new_win=n_new_win,
        n_out_blocks=n_out_blocks,
        S=S,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(bp // b_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # src_idx
            pl.BlockSpec((T, b_tile, c_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, S * BLOCK, BLOCK), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, c_pad, BLOCK), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 8, BLOCK), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            plane_spec, plane_spec, plane_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, nb, b_tile, BLOCK), jnp.bfloat16),  # spike bufs
            pltpu.VMEM((b_tile, c_pad), jnp.bfloat16),         # x_t
            pltpu.VMEM((b_tile, no_pad), jnp.float32),         # so
            pltpu.VMEM((b_tile, no_pad), jnp.float32),         # prev_t
            pltpu.VMEM((b_tile, no_pad), jnp.float32),         # c_cur
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(
        params.src_idx, xs, w_blocks, w_in_t, leak_p,
        to_planes(v), to_planes(refrac), to_planes(s_prev),
    )

    v_out = from_planes(outs[0])[:B]
    refrac_out = from_planes(outs[1])[:B]
    s_prev_out = from_planes(outs[2])[:B]
    (counts, sum_t, sum_t2, first, last, n_isi, sum_isi, sum_isi2,
     bursts) = [o[:B, :no] for o in outs[3:12]]
    win_counts = outs[12][:B, :, :no]
    seg = dict(
        counts=counts, sum_t=sum_t, sum_t2=sum_t2, first=first, last=last,
        n_isi=n_isi, sum_isi=sum_isi, sum_isi2=sum_isi2, bursts=bursts,
    )
    return v_out, refrac_out, s_prev_out, seg, win_counts
