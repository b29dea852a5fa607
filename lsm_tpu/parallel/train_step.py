"""The fused multi-chip training step: spikes -> features -> readout update.

One shard_map program over a (data, model) mesh:
  - input spike batch sharded along 'data';
  - reservoir recurrent matrix sharded column-wise along 'model'
    (tensor-parallel RNN: one all_gather of the spike slice per timestep);
  - feature standardization moments psum-reduced over 'data';
  - readout cross-entropy gradients psum-reduced over 'data', applied to
    replicated readout params.

"Training" in this framework = fitting the readout on reservoir features
(the reservoir itself is fixed-random by design — that is the Liquid State
Machine model class, reference extract_lsm_features.py:188). This step is
the unit the driver's `dryrun_multichip` compiles and executes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lsm_tpu.models.reservoir import ReservoirParams, features_from_stats
from lsm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from lsm_tpu.parallel.sharded import _simulate_model_sharded_local


class ReadoutState(NamedTuple):
    w: jax.Array   # (D, K)
    b: jax.Array   # (K,)


def make_train_step(
    params: ReservoirParams,
    feature_keys: Tuple[str, ...],
    num_classes: int,
    mesh: Mesh,
    lr: float = 0.1,
    l2: float = 1e-3,
):
    """Build a jitted (spikes, labels, readout) -> (loss, readout') step."""
    no = params.n_outputs

    def local_step(w_rec, w_in, leak, spikes_local, labels_local, w, b):
        st = _simulate_model_sharded_local(
            w_rec, w_in, leak, spikes_local,
            params.threshold, params.refractory,
            params.burst_isi_max, params.n_rate_windows,
            n_outputs=no,
        )
        local_counts = st.pop("local_counts")
        st["all_counts"] = jax.lax.all_gather(
            local_counts, MODEL_AXIS, axis=1, tiled=True
        )[:, : params.n_neurons]
        feats = features_from_stats(st, feature_keys)        # (B_local, D)

        # Global standardization moments over the data axis: TWO psum
        # rounds (global mean, then CENTERED second moment) — the
        # one-pass E[x^2]-mean^2 form catastrophically cancels in f32
        # for large-mean spike-time features (see scaler.fit_scaler).
        from lsm_tpu.readout.scaler import fit_scaler_from_moments

        b_local = feats.shape[0]
        n_global = jax.lax.psum(jnp.float32(b_local), DATA_AXIS)
        mean = jax.lax.psum(jnp.sum(feats, axis=0), DATA_AXIS) / n_global
        dev = feats - mean[None, :]
        sum_d2 = jax.lax.psum(jnp.sum(dev * dev, axis=0), DATA_AXIS)
        sc = fit_scaler_from_moments(
            jnp.zeros_like(mean), sum_d2, n_global, shift=mean
        )
        feats_std = (feats - sc.mean) / sc.scale

        # Readout gradient step with psum'd gradients (data parallel).
        def loss_fn(wb):
            w_, b_ = wb
            logits = feats_std @ w_ + b_
            ce = jnp.sum(
                -jax.nn.log_softmax(logits)[
                    jnp.arange(b_local), labels_local
                ]
            )
            return ce + 0.5 * l2 * jnp.sum(w_ * w_) / jax.lax.psum(1.0, DATA_AXIS)

        loss_local, (gw, gb) = jax.value_and_grad(loss_fn)((w, b))
        loss = jax.lax.psum(loss_local, DATA_AXIS) / n_global
        gw = jax.lax.psum(gw, DATA_AXIS) / n_global
        gb = jax.lax.psum(gb, DATA_AXIS) / n_global
        return loss, w - lr * gw, b - lr * gb

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(None, MODEL_AXIS),       # w_rec
            P(None, MODEL_AXIS),       # w_in
            P(MODEL_AXIS),             # leak
            P(DATA_AXIS, None, None),  # spikes
            P(DATA_AXIS),              # labels
            P(), P(),                  # readout params replicated
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    c_pad = params.w_in.shape[0]

    @jax.jit
    def train_step(spikes, labels, readout: ReadoutState):
        if spikes.shape[1] > c_pad:
            raise ValueError(
                f"spike batch has {spikes.shape[1]} channels but the "
                f"reservoir's input projection takes at most {c_pad} — "
                "rebuild the reservoir with n_channels matching the "
                "dataset (incl. redundancy_factor)"
            )
        if spikes.shape[1] != c_pad:
            spikes = jnp.pad(
                spikes, ((0, 0), (0, c_pad - spikes.shape[1]), (0, 0))
            )
        loss, w, b = fn(
            params.w_rec, params.w_in, params.leak,
            spikes, labels, readout.w, readout.b,
        )
        return loss, ReadoutState(w=w, b=b)

    return train_step
