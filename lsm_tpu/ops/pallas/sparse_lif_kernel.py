"""Fused Pallas TPU kernel for the BLOCK-SPARSE LIF reservoir.

The scaled-reservoir bottleneck (BASELINE.json configs[3], reference
constants extract_lsm_features.py:10-16 scaled to 10k neurons) is the
recurrent weight matrix: dense it is (N, N) f32 = 400 MB at 10k neurons —
far beyond VMEM — so every formulation that keeps W dense (the XLA scan,
the dense TP shard_map path, the dense Pallas lif_kernel) re-streams
hundreds of MB from HBM on each of the 400 timesteps. Measured on v5e:
1,619 utt/s/chip for the dense TP path, and the XLA gather+einsum sparse
formulation is WORSE (981 utt/s) because the per-step gather materializes
(B, nb*S, 128) in HBM.

The block-sparse W (models/sparse.py: ring band + R partner blocks,
S = n_band + R source blocks per destination block) is ~10x smaller and
FITS in VMEM (~34 MB bf16 at 10k neurons). This kernel therefore keeps
EVERYTHING resident for the whole simulation — sparse weight blocks,
membrane state, double-buffered spike planes, streaming statistics — and
per-step HBM traffic drops to zero, like the flagship dense lif_kernel
but with 10x less VMEM spent on weights and ~6x fewer MXU FLOPs.

Layout: all (B, N) state lives as (nb, B_t, 128) block planes, so the
per-destination-block gather of S source planes is S dynamic leading-axis
VMEM reads (free) instead of a lane-dimension shuffle; the recurrent
update for dst block j is S accumulated (B_t, 128) @ (128, 128) MXU
matmuls read straight from the source planes (measured on v5e a few
percent faster than gathering into one (B_t, S*128) operand first —
`fuse_gather=True` keeps the gathered form). Spike planes are
double-buffered (read t%2, write (t+1)%2) because every destination block
may read every source block before it is overwritten.

Statistics match models/reservoir.simulate_batch exactly (same streaming
accumulators as the dense lif_kernel, windowed-rate moments form).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsm_tpu.models.sparse import BLOCK, SparseReservoirParams

_LANE = 128


def _round_up(x: int, m: int = _LANE) -> int:
    return -(-x // m) * m


def _sparse_lif_kernel(
    src_idx_ref,   # SMEM (nb, S) int32
    xs_ref,        # (T, B_t, C_pad) uint8
    w_blocks_ref,  # (nb, S*128, 128) bf16
    w_in_ref,      # (nb, C_pad, 128) bf16
    leak_ref,      # (nb, 8, 128) f32 (row 0 = 1 - leak)
    counts_ref, sum_t_ref, sum_t2_ref, first_ref, last_ref,
    n_isi_ref, sum_isi_ref, sum_isi2_ref, bursts_ref,
    win_sum_ref, win_sum2_ref, all_counts_ref,
    v_s, refrac_s, s_bufs, g_s, x_s, so_s, prev_t_s, c_cur_s,
    *, threshold, refractory, burst_isi_max, win_len, n_win, t_total,
    n_out_blocks, S, fuse_gather,
):
    b_t = xs_ref.shape[1]
    nb = w_blocks_ref.shape[0]

    v_s[:] = jnp.zeros_like(v_s)
    refrac_s[:] = jnp.zeros_like(refrac_s)
    s_bufs[:] = jnp.zeros_like(s_bufs)
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
    win_sum_ref[:] = jnp.zeros_like(win_sum_ref)
    win_sum2_ref[:] = jnp.zeros_like(win_sum2_ref)
    all_counts_ref[:] = jnp.zeros_like(all_counts_ref)

    def block_update(j, rd, wr, static_out_slot):
        """Drive + LIF update for destination block j this step.

        static_out_slot: python int for output blocks (their spikes are
        additionally written to the (B_t, no_pad) stats plane at a STATIC
        lane offset), or None for the fori-loop body over the rest.
        """
        if fuse_gather:
            # Gather the S source spike planes into one (B_t, S*128) operand.
            for s in range(S):
                g_s[:, s * BLOCK : (s + 1) * BLOCK] = s_bufs[
                    rd, src_idx_ref[j, s]
                ]
            drive = jnp.dot(
                g_s[:], w_blocks_ref[j], preferred_element_type=jnp.float32
            ) + jnp.dot(x_s[:], w_in_ref[j], preferred_element_type=jnp.float32)
        else:
            # Accumulate S small matmuls straight from the spike planes.
            drive = jnp.dot(
                x_s[:], w_in_ref[j], preferred_element_type=jnp.float32
            )
            for s in range(S):
                drive += jnp.dot(
                    s_bufs[rd, src_idx_ref[j, s]],
                    w_blocks_ref[j, s * BLOCK : (s + 1) * BLOCK, :],
                    preferred_element_type=jnp.float32,
                )

        v = v_s[j]
        rf = refrac_s[j]
        leak_keep = leak_ref[j, 0, :][None, :]
        active = rf == 0.0
        v_new = jnp.where(active, v * leak_keep + drive, 0.0)
        spike = jnp.logical_and(v_new >= threshold, active)
        v_s[j] = jnp.where(spike, 0.0, v_new)
        refrac_s[j] = jnp.where(
            spike, float(refractory), jnp.maximum(rf - 1.0, 0.0)
        )
        sf = spike.astype(jnp.float32)
        s_bufs[wr, j] = spike.astype(jnp.bfloat16)
        all_counts_ref[j] = all_counts_ref[j] + sf
        if static_out_slot is not None:
            so_s[:, static_out_slot * BLOCK : (static_out_slot + 1) * BLOCK] = sf

    def step(t, _):
        rd = t % 2
        wr = 1 - rd
        # uint8 -> bf16 routes through int32 (no direct cast in Mosaic).
        x_s[:] = xs_ref[t].astype(jnp.int32).astype(jnp.bfloat16)

        # Output-neuron blocks first (static unroll: their spike planes
        # also land in the (B_t, no_pad) stats layout at static offsets).
        for j_static in range(n_out_blocks):
            block_update(j_static, rd, wr, j_static)

        def rest(j, c):
            block_update(j, rd, wr, None)
            return c

        jax.lax.fori_loop(n_out_blocks, nb, rest, 0)

        # Streaming statistics on the output-neuron plane (same math as
        # the dense lif_kernel; see models/reservoir.update_output_stats).
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
        # Window boundaries: the first n_win-1 windows are win_len steps;
        # ALL remaining steps fold into the last window (matching the XLA
        # path's min(t // win_len, n_win - 1) clamp for T % n_win != 0).
        boundary = jnp.logical_or(
            jnp.logical_and(
                (t + 1) % win_len == 0, (t + 1) // win_len < n_win
            ),
            t == t_total - 1,
        )

        @pl.when(boundary)
        def _():
            c = c_cur_s[:]
            win_sum_ref[:] = win_sum_ref[:] + c
            win_sum2_ref[:] = win_sum2_ref[:] + c * c
            c_cur_s[:] = jnp.zeros_like(c)

        return 0

    jax.lax.fori_loop(0, t_total, step, 0)


def _vmem_estimate(nb: int, S: int, c_pad: int, t: int, b_t: int,
                   no_pad: int, grid: int) -> int:
    """Mosaic PIPELINES grid-varying blocks: with more than one batch
    tile, every per-tile input/output block is double-buffered, so those
    terms count twice — the same model the chunk sibling
    (sparse_lif_chunk_kernel._vmem_estimate) validated against a real
    'Used 181.77M of 128.00M vmem' compile failure. Weights and scratch
    are grid-invariant and count once."""
    mult = 1 if grid <= 1 else 2
    invariant = (
        nb * S * BLOCK * BLOCK * 2          # w_blocks bf16
        + nb * c_pad * BLOCK * 2            # w_in bf16
        + 2 * nb * b_t * BLOCK * 2          # spike double-buffer (scratch)
        + b_t * S * BLOCK * 2 + b_t * c_pad * 2
    )
    per_tile = (
        t * b_t * c_pad                     # xs uint8
        + nb * b_t * BLOCK * (4 + 4 + 4)    # v, refrac, all_counts f32
        + 14 * b_t * no_pad * 4             # stats planes
    )
    return invariant + mult * per_tile


def pick_b_tile(params: SparseReservoirParams, t: int, c_pad: int,
                batch: Optional[int] = None,
                vmem_budget: int = 120 * 1024 * 1024) -> Optional[int]:
    """Largest batch tile in {256, 128} that fits VMEM (including the
    pipeline double-buffering its grid implies), else None.
    `batch=None` assumes a multi-tile grid (conservative)."""
    nb = params.n_neurons // BLOCK
    S = params.src_idx.shape[1]
    no_pad = _round_up(min(params.n_outputs, params.n_neurons))
    for b_t in (256, 128):
        grid = 2 if batch is None else -(-batch // b_t)
        if _vmem_estimate(nb, S, c_pad, t, b_t, no_pad, grid) < vmem_budget:
            return b_t
    return None


def simulate_batch_sparse_pallas(
    params: SparseReservoirParams,
    spikes_in: jnp.ndarray,
    b_tile: Optional[int] = None,
    fuse_gather: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Drop-in for models.sparse.simulate_batch_sparse (bf16 operands).

    Returns the same stats dict, with windowed-rate variance moments
    (`win_sum`, `win_sum2`, `n_win_used`) in place of `win_counts`
    (features_from_stats accepts either form).
    """
    B, C, T = spikes_in.shape
    n = params.n_neurons
    nb = n // BLOCK
    S = params.src_idx.shape[1]
    c_pad = params.w_in.shape[0]
    no_pad = _round_up(min(params.n_outputs, n))
    n_out_blocks = no_pad // BLOCK
    n_win = params.n_rate_windows
    win_len = max(1, T // n_win)
    if b_tile is None:
        b_tile = pick_b_tile(params, T, c_pad, batch=B)
        if b_tile is None:
            raise ValueError("sparse reservoir too large for VMEM kernel")

    x = spikes_in.astype(jnp.uint8)
    if C != c_pad:
        x = jnp.pad(x, ((0, 0), (0, c_pad - C), (0, 0)))
    pad_b = (-B) % b_tile
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
    bp = B + pad_b
    xs = x.transpose(2, 0, 1)                                  # (T, B, C_pad)

    w_blocks = params.w_blocks.astype(jnp.bfloat16).reshape(nb, S * BLOCK, BLOCK)
    w_in_t = (
        params.w_in.astype(jnp.bfloat16).reshape(c_pad, nb, BLOCK)
        .transpose(1, 0, 2)                                    # (nb, C_pad, 128)
    )
    leak_p = jnp.zeros((nb, 8, BLOCK), jnp.float32).at[:, 0, :].set(
        (1.0 - params.leak).reshape(nb, BLOCK)
    )

    stat_shape = jax.ShapeDtypeStruct((bp, no_pad), jnp.float32)
    out_shapes = [stat_shape] * 11 + [
        jax.ShapeDtypeStruct((nb, bp, BLOCK), jnp.float32)
    ]
    stat_spec = pl.BlockSpec((b_tile, no_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [stat_spec] * 11 + [
        pl.BlockSpec((nb, b_tile, BLOCK), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM)
    ]

    kernel = functools.partial(
        _sparse_lif_kernel,
        threshold=float(params.threshold),
        refractory=int(params.refractory),
        burst_isi_max=int(params.burst_isi_max),
        win_len=win_len,
        n_win=n_win,
        t_total=T,
        n_out_blocks=n_out_blocks,
        S=S,
        fuse_gather=fuse_gather,
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
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((nb, b_tile, BLOCK), jnp.float32),      # v
            pltpu.VMEM((nb, b_tile, BLOCK), jnp.float32),      # refrac
            pltpu.VMEM((2, nb, b_tile, BLOCK), jnp.bfloat16),  # spike bufs
            pltpu.VMEM((b_tile, S * BLOCK), jnp.bfloat16),     # gather
            pltpu.VMEM((b_tile, c_pad), jnp.bfloat16),         # x_t
            pltpu.VMEM((b_tile, no_pad), jnp.float32),         # so
            pltpu.VMEM((b_tile, no_pad), jnp.float32),         # prev_t
            pltpu.VMEM((b_tile, no_pad), jnp.float32),         # c_cur
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(params.src_idx, xs, w_blocks, w_in_t, leak_p)

    (counts, sum_t, sum_t2, first, last, n_isi, sum_isi, sum_isi2, bursts,
     win_sum, win_sum2, all_counts) = outs

    no = params.n_outputs
    all_counts = all_counts.transpose(1, 0, 2).reshape(bp, nb * BLOCK)
    return dict(
        counts=counts[:B, :no],
        sum_t=sum_t[:B, :no],
        sum_t2=sum_t2[:B, :no],
        first=first[:B, :no],
        last=last[:B, :no],
        n_isi=n_isi[:B, :no],
        sum_isi=sum_isi[:B, :no],
        sum_isi2=sum_isi2[:B, :no],
        bursts=bursts[:B, :no],
        win_sum=win_sum[:B, :no],
        win_sum2=win_sum2[:B, :no],
        # The division matches the XLA path's mean over exactly n_win
        # windows (unflushed/empty windows contribute zero to the sums).
        n_win_used=float(n_win),
        all_counts=all_counts[:B, :n],
    )
