"""Fused Pallas TPU kernel for the LIF reservoir with streaming statistics.

This is the hottest op in the framework (SURVEY.md section 3.3: the
reference's `simulate()` loop). The XLA lax.scan formulation round-trips the
(B, N) carry and twelve stat accumulators through HBM on every one of the
400 timesteps. Here one kernel invocation per batch tile keeps EVERYTHING
resident in VMEM for the whole simulation:

  - w_rec (N_pad, N_pad) bf16 + w_in (C_pad, N_pad) bf16 (operands only;
    accumulation and membrane state are f32),
  - membrane potential / refractory counters / previous spikes,
  - all streaming statistics (counts, spike-time moments, first/last, ISI
    moments, bursts, windowed-rate moments, full-reservoir counts),
  - the input spike train tile (T, B_t, C) uint8.

HBM traffic per tile = inputs (T*B_t*C bytes) + final stats — about 300x
less than the scan. The per-step MXU work is a clean
(B_t, N_pad) x (N_pad, N_pad) matmul.

The windowed-rate variance is computed from streaming moments (sum of
per-window counts and of their squares, flushed at window boundaries)
instead of materializing per-window counts — `features_from_stats` accepts
either form.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsm_tpu.models.reservoir import ReservoirParams

_B_TILE = 256
_LANE = 128


def _round_up(x: int, m: int = _LANE) -> int:
    return -(-x // m) * m


def _lif_kernel(
    xs_ref,      # (T, B_t, C_pad) uint8
    w_rec_ref,   # (N_pad, N_pad) bf16
    w_in_ref,    # (C_pad, N_pad) bf16
    leak_ref,    # (8, N_pad) f32 (row 0 = 1 - leak, padded for tiling)
    counts_ref, sum_t_ref, sum_t2_ref, first_ref, last_ref,
    n_isi_ref, sum_isi_ref, sum_isi2_ref, bursts_ref,
    win_sum_ref, win_sum2_ref, all_counts_ref,
    v_s, refrac_s, s_prev_s, prev_t_s, c_cur_s,
    *, threshold, refractory, burst_isi_max, n_outputs_pad, win_len, n_win, t_total,
):
    b_t = xs_ref.shape[1]
    n_pad = w_rec_ref.shape[0]
    no = n_outputs_pad

    # Init accumulators (outputs double as VMEM accumulators).
    v_s[:] = jnp.zeros_like(v_s)
    refrac_s[:] = jnp.zeros_like(refrac_s)
    s_prev_s[:] = jnp.zeros_like(s_prev_s)
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

    leak_keep = leak_ref[0, :][None, :]                       # (1, N_pad)

    def step(t, _):
        # uint8 -> bf16 must route through int32/f32 (Mosaic has no direct cast).
        x_t = xs_ref[t].astype(jnp.int32).astype(jnp.bfloat16)  # (B_t, C_pad)
        drive = (
            jnp.dot(s_prev_s[:].astype(jnp.bfloat16), w_rec_ref[:],
                    preferred_element_type=jnp.float32)
            + jnp.dot(x_t, w_in_ref[:],
                      preferred_element_type=jnp.float32)
        )
        active = refrac_s[:] == 0.0
        v_new = jnp.where(active, v_s[:] * leak_keep + drive, 0.0)
        spike = jnp.logical_and(v_new >= threshold, active)
        v_s[:] = jnp.where(spike, 0.0, v_new)
        refrac_s[:] = jnp.where(
            spike, float(refractory), jnp.maximum(refrac_s[:] - 1.0, 0.0)
        )
        sf = spike.astype(jnp.float32)
        s_prev_s[:] = sf
        all_counts_ref[:] = all_counts_ref[:] + sf

        so = sf[:, :no]                                       # output neurons
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


def simulate_batch_pallas(
    params: ReservoirParams, spikes_in: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Drop-in for models.reservoir.simulate_batch (bf16 matmul operands).

    Returns the same stats dict, with windowed-rate VARIANCE moments
    (`win_sum`, `win_sum2`, `n_win_used`) in place of `win_counts`.
    """
    B, C, T = spikes_in.shape
    n_pad = params.w_rec.shape[0]
    c_pad = params.w_in.shape[0]
    no_pad = _round_up(params.n_outputs)
    n_win = params.n_rate_windows
    win_len = max(1, T // n_win)

    x = spikes_in.astype(jnp.uint8)
    if C != c_pad:
        x = jnp.pad(x, ((0, 0), (0, c_pad - C), (0, 0)))
    pad_b = (-B) % _B_TILE
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
    bp = B + pad_b
    xs = x.transpose(2, 0, 1)                                  # (T, B, C_pad)

    leak_row = jnp.zeros((8, n_pad), jnp.float32).at[0].set(1.0 - params.leak)

    stat_shape = jax.ShapeDtypeStruct((bp, no_pad), jnp.float32)
    out_shapes = [stat_shape] * 11 + [
        jax.ShapeDtypeStruct((bp, n_pad), jnp.float32)
    ]
    stat_spec = pl.BlockSpec((_B_TILE, no_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [stat_spec] * 11 + [
        pl.BlockSpec((_B_TILE, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]

    kernel = functools.partial(
        _lif_kernel,
        threshold=float(params.threshold),
        refractory=int(params.refractory),
        burst_isi_max=int(params.burst_isi_max),
        n_outputs_pad=no_pad,
        win_len=win_len,
        n_win=n_win,
        t_total=T,
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
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((_B_TILE, n_pad), jnp.float32),   # v
            pltpu.VMEM((_B_TILE, n_pad), jnp.float32),   # refrac (f32 counter)
            pltpu.VMEM((_B_TILE, n_pad), jnp.float32),   # s_prev
            pltpu.VMEM((_B_TILE, no_pad), jnp.float32),  # prev_t
            pltpu.VMEM((_B_TILE, no_pad), jnp.float32),  # current-window counts
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        xs,
        params.w_rec.astype(jnp.bfloat16),
        params.w_in.astype(jnp.bfloat16),
        leak_row,
    )

    (counts, sum_t, sum_t2, first, last, n_isi, sum_isi, sum_isi2, bursts,
     win_sum, win_sum2, all_counts) = outs

    no = params.n_outputs
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
        # Matches the XLA path's mean over exactly n_win windows
        # (unflushed/empty windows contribute zero to the sums).
        n_win_used=float(n_win),
        all_counts=all_counts[:B, : params.n_neurons],
    )
