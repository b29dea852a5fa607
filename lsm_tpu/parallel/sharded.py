"""Sharded execution paths: data-parallel stages and the model-parallel
(neuron-sharded) reservoir for scaled configurations.

Data parallelism: utterance batches shard along the mesh 'data' axis; the
featurizer and reservoir are element-wise in the batch, so XLA partitions
them with zero communication. Global reductions (calibration spike sums,
scaler moments, readout gradients) become psums over the data axis.

Model parallelism (for 10k+ neuron reservoirs, BASELINE.json configs[3]):
the recurrent matrix W (N, N) is sharded column-wise over the 'model' axis —
each shard owns the update of its neuron slice. Per scan step each shard
computes (B_local, N) x (N, N/m) locally and all_gathers the new spike slice
along 'model' so the next step sees the full spike vector. This is the
standard tensor-parallel RNN decomposition: compute scales 1/m per chip,
communication is one (B_local, N/m) all-gather per step riding ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lsm_tpu.models.reservoir import ReservoirParams, features_from_stats
from lsm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def data_parallel_extract(
    params: ReservoirParams,
    spikes: jax.Array,
    feature_keys: Tuple[str, ...],
    mesh: Mesh,
) -> jax.Array:
    """Pure-DP feature extraction: shard batch, replicate weights."""
    from lsm_tpu.models.reservoir import extract_features_batch

    spikes = jax.device_put(spikes, NamedSharding(mesh, P(DATA_AXIS)))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    return extract_features_batch(params, spikes, feature_keys)


def featurize_dp(audio: jax.Array, fcfg, mesh: Mesh) -> jax.Array:
    """Data-parallel featurization via shard_map.

    Plain jit on a batch-sharded global array cannot partition the Pallas
    gtgram kernel (Mosaic custom calls have no GSPMD rule); shard_map runs
    the full single-device featurizer — Pallas kernel included — on each
    device's local shard. Zero collectives (per-utterance independent).
    Requires the global batch divisible by the data-axis size.
    """
    from lsm_tpu.models.frontend import featurize_batch

    def local_fn(audio_local):
        return featurize_batch(audio_local, fcfg)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(DATA_AXIS, None),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )
    return fn(audio)


def extract_features_dp(
    params: ReservoirParams,
    spikes: jax.Array,
    feature_keys: Tuple[str, ...],
    mesh: Mesh,
) -> jax.Array:
    """The PRODUCTION data-parallel extractor: shard_map over the data axis.

    Unlike `data_parallel_extract` (which relies on jit auto-partitioning
    of the XLA scan), this routes each device's local shard through the
    backend-dispatching `extract_features`, so on TPU every chip runs the
    fused Pallas LIF kernel on its shard. No collectives are needed — the
    reservoir is independent per utterance; weights are replicated.
    Requires the global batch divisible by the data-axis size.
    """
    from lsm_tpu.models.reservoir import extract_features

    def local_fn(w_rec, w_in, leak, spikes_local):
        p = dataclasses.replace(params, w_rec=w_rec, w_in=w_in, leak=leak)
        return extract_features(p, spikes_local, feature_keys)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS, None, None)),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )
    return fn(params.w_rec, params.w_in, params.leak, spikes)


def _simulate_model_sharded_local(
    w_rec_shard: jax.Array,   # (N, N/m) — columns owned by this shard
    w_in_shard: jax.Array,    # (C, N/m)
    leak_shard: jax.Array,    # (N/m,)
    spikes_in: jax.Array,     # (B_local, C, T)
    threshold: float,
    refractory: int,
    burst_isi_max: int,
    n_rate_windows: int,
    n_outputs: int,
) -> Dict[str, jax.Array]:
    """Per-shard LIF scan.

    The membrane/refractory update covers this shard's neuron slice; the
    per-step all_gather (the TP RNN's one collective) assembles the full
    spike vector for the next step's recurrent matmul — and since every
    shard then HOLDS the full vector, the feature statistics accumulate
    REPLICATED on the gathered output-neuron slice s_full[:, :n_outputs]
    (O(B * n_outputs) per step) instead of per-shard over all local
    neurons (O(B * N/m) — 25x more state at the 10k/400 scale, measured
    ~40% slower end-to-end). Only `counts` also accumulates per-shard over
    local neurons, for the full-reservoir participation diagnostics.

    Returned stats are replicated across the model axis except
    `local_counts` (sharded, (B, N/m)).
    """
    B, C, T = spikes_in.shape
    n_local = w_rec_shard.shape[1]
    no = n_outputs
    n_win = n_rate_windows
    win_len = max(1, T // n_win)

    xs_t = jnp.moveaxis(spikes_in.astype(jnp.float32), -1, 0)
    leak_keep = 1.0 - leak_shard

    def step(carry, inp):
        x_t, t = inp
        v, refrac, s_prev_full, st = carry
        # s_prev_full: (B, N) — gathered full spike vector from last step.
        drive = (
            jnp.dot(s_prev_full, w_rec_shard, preferred_element_type=jnp.float32)
            + jnp.dot(x_t, w_in_shard, preferred_element_type=jnp.float32)
        )
        active = refrac == 0
        v_new = jnp.where(active, v * leak_keep + drive, 0.0)
        spike = jnp.logical_and(v_new >= threshold, active)
        v_new = jnp.where(spike, 0.0, v_new)
        refrac_new = jnp.where(spike, refractory, jnp.maximum(refrac - 1, 0))

        s_local = spike.astype(jnp.float32)                    # (B, N/m)
        # The one collective per step: assemble the full spike vector.
        s_full = jax.lax.all_gather(s_local, MODEL_AXIS, axis=1, tiled=True)

        so = s_full[:, :no]                                    # output neurons
        so_b = so > 0.0
        tf = t.astype(jnp.float32)
        prev_t = st["prev_t"]
        has_prev = prev_t >= 0.0
        isi = tf - prev_t
        isi_event = jnp.logical_and(so_b, has_prev)
        isi_f = jnp.where(isi_event, isi, 0.0)
        wi = t // win_len
        win_onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_win), 2)
            == jnp.minimum(wi, n_win - 1)
        ).astype(jnp.float32)

        new_st = dict(
            local_counts=st["local_counts"] + s_local,
            counts=st["counts"] + so,
            sum_t=st["sum_t"] + so * tf,
            sum_t2=st["sum_t2"] + so * tf * tf,
            first=jnp.minimum(st["first"], jnp.where(so_b, tf, jnp.inf)),
            last=jnp.maximum(st["last"], jnp.where(so_b, tf, -1.0)),
            n_isi=st["n_isi"] + isi_event.astype(jnp.float32),
            sum_isi=st["sum_isi"] + isi_f,
            sum_isi2=st["sum_isi2"] + isi_f * isi_f,
            bursts=st["bursts"]
            + jnp.logical_and(isi_event, isi <= burst_isi_max).astype(jnp.float32),
            prev_t=jnp.where(so_b, tf, prev_t),
            win_counts=st["win_counts"] + so[:, :, None] * win_onehot,
        )
        return (v_new, refrac_new, s_full, new_st), None

    z_loc = jnp.zeros((B, n_local), jnp.float32)
    z_out = jnp.zeros((B, no), jnp.float32)
    init_stats = dict(
        local_counts=z_loc,
        counts=z_out, sum_t=z_out, sum_t2=z_out,
        first=jnp.full((B, no), jnp.inf, jnp.float32),
        last=jnp.full((B, no), -1.0, jnp.float32),
        n_isi=z_out, sum_isi=z_out, sum_isi2=z_out, bursts=z_out,
        prev_t=jnp.full((B, no), -1.0, jnp.float32),
        win_counts=jnp.zeros((B, no, n_win), jnp.float32),
    )
    n_full = w_rec_shard.shape[0]
    init = (z_loc, jnp.zeros((B, n_local), jnp.int32),
            jnp.zeros((B, n_full), jnp.float32), init_stats)
    ts = jnp.arange(T, dtype=jnp.int32)
    (_, _, _, st), _ = jax.lax.scan(step, init, (xs_t, ts))
    st = dict(st)
    st.pop("prev_t")
    return st


def extract_features_model_sharded(
    params: ReservoirParams,
    spikes: jax.Array,
    feature_keys: Tuple[str, ...],
    mesh: Mesh,
) -> jax.Array:
    """DP x TP reservoir feature extraction under shard_map.

    Batch shards along 'data'; W_rec columns (target neurons) shard along
    'model'. Returns (B, len(keys) * n_outputs) with the batch axis sharded
    along 'data' and features replicated along 'model'.
    """
    n_pad = params.w_rec.shape[0]
    no = params.n_outputs
    c_pad = params.w_in.shape[0]
    if spikes.shape[1] != c_pad:
        spikes = jnp.pad(
            spikes, ((0, 0), (0, c_pad - spikes.shape[1]), (0, 0))
        )

    def local_fn(w_rec, w_in, leak, spikes_local):
        st = _simulate_model_sharded_local(
            w_rec, w_in, leak, spikes_local,
            params.threshold, params.refractory,
            params.burst_isi_max, params.n_rate_windows,
            n_outputs=no,
        )
        # Output-neuron stats are already replicated across the model axis;
        # only the full-reservoir counts (diagnostics) need re-assembly.
        local_counts = st.pop("local_counts")
        st["all_counts"] = jax.lax.all_gather(
            local_counts, MODEL_AXIS, axis=1, tiled=True
        )[:, : params.n_neurons]
        return features_from_stats(st, feature_keys)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, MODEL_AXIS),   # w_rec: (N, N/m)
            P(None, MODEL_AXIS),   # w_in:  (C, N/m)
            P(MODEL_AXIS),         # leak:  (N/m,)
            P(DATA_AXIS, None, None),
        ),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )
    return fn(params.w_rec, params.w_in, params.leak, spikes)
