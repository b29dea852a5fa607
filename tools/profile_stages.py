#!/usr/bin/env python
"""Per-stage wall-clock breakdown on the current device.

Usage: python tools/profile_stages.py [--n 2400] [--filterbank gammatone]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2400)
    ap.add_argument("--filterbank", default="gammatone")
    ap.add_argument("--gammatone-method", default="iir")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lsm_tpu.config import FEATURE_SETS, FrontendConfig, ReservoirConfig
    from lsm_tpu.io.dataset import synthetic_audio_batch
    from lsm_tpu.models import reservoir as res
    from lsm_tpu.models.frontend import featurize_batch
    from lsm_tpu.readout import logistic, scaler

    fcfg = FrontendConfig(filterbank=args.filterbank,
                          gammatone_method=args.gammatone_method)
    rcfg = ReservoirConfig()
    keys = tuple(FEATURE_SETS["original"])

    audio_np, labels_np = synthetic_audio_batch(
        n_per_class=-(-args.n // 12), n_classes=12, seed=42
    )
    audio = jnp.asarray(audio_np[: args.n])
    labels = jnp.asarray(labels_np[: args.n])
    params = res.init_reservoir(rcfg, n_channels=fcfg.n_filters,
                                mean_weight=0.0118)

    @jax.jit
    def _checksum(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l, dtype=jnp.float32) for l in leaves)

    def force(out):
        # Reduce to a scalar and pull it to host: under the axon relay,
        # block_until_ready on a large device buffer can return before the
        # producing computation has run; a host-materialized data-dependent
        # scalar cannot lie. The reduction is jitted so it is one fused pass
        # (an eager astype+sum would add hundreds of ms of HBM traffic and
        # dominate the measurement).
        return float(_checksum(out))

    def timed(name, fn, *a):
        out = fn(*a)
        force(out)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(*a)
            force(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:24s} {best*1e3:9.1f} ms   {args.n/best:10.0f} utt/s")
        return out

    spikes = timed("featurize", lambda a: featurize_batch(a, fcfg), audio)
    feats = timed(
        "reservoir+features",
        lambda s: res.extract_features_batch(params, s, keys),
        spikes,
    )
    st = scaler.fit_scaler(feats)
    xs = scaler.transform(st, feats)
    readout = logistic.fit_ridge(xs, labels, num_classes=12, alpha=10.0)
    timed(
        "standardize+predict",
        lambda f: logistic.predict(readout, scaler.transform(st, f)),
        feats,
    )


if __name__ == "__main__":
    main()
