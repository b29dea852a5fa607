#!/usr/bin/env python
"""End-to-end benchmark: featurize + simulate + classify utterances on TPU.

North-star metric (BASELINE.json): utterances/sec/chip for the full
pipeline — raw 1 s audio -> gammatone spike encoding -> 1000-neuron LIF
reservoir -> standardized features -> readout classification — on the
12-class Speech Commands test-split size (2400 utterances). The reference
target is <10 s on a v5e-8 slice, i.e. 30 utt/s/chip; vs_baseline is the
ratio of the measured rate to that target.

Prints exactly ONE JSON line on stdout; all narration goes to stderr.
Uses a synthetic corpus when Speech Commands is not on disk (same compute).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-test", type=int, default=2400)
    parser.add_argument("--n-filters", type=int, default=128)
    parser.add_argument("--filterbank", default="gammatone",
                        choices=["mel", "gammatone"])
    parser.add_argument("--gammatone-method", default="iir",
                        choices=["iir", "fft"])
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from lsm_tpu.config import FEATURE_SETS, FrontendConfig, ReservoirConfig
    from lsm_tpu.io.dataset import synthetic_audio_batch
    from lsm_tpu.models import reservoir as res
    from lsm_tpu.models.frontend import featurize_batch
    from lsm_tpu.models.calibration import calibrate_weight
    from lsm_tpu.readout import logistic, scaler

    n_chips = jax.device_count()
    log(f"devices: {jax.devices()} ({n_chips} chip(s))")

    fcfg = FrontendConfig(
        n_filters=args.n_filters,
        filterbank=args.filterbank,
        gammatone_method=args.gammatone_method,
    )
    rcfg = ReservoirConfig()
    keys = tuple(FEATURE_SETS["original"])

    n = args.n_test
    log(f"generating {n} synthetic utterances ...")
    audio_np, labels_np = synthetic_audio_batch(
        n_per_class=-(-n // 12), n_classes=12, seed=42
    )
    audio_np = audio_np[:n]
    labels_np = labels_np[:n]
    audio = jnp.asarray(audio_np)
    labels = jnp.asarray(labels_np)

    # --- setup (not timed): calibrate, build reservoir, fit readout --------
    spikes0 = featurize_batch(audio, fcfg)
    _, mean_weight = calibrate_weight(rcfg, spikes0, multiplier=0.6)
    params = res.init_reservoir(rcfg, n_channels=args.n_filters,
                                mean_weight=mean_weight)
    feats0 = res.extract_features(params, spikes0, keys)
    st = scaler.fit_scaler(feats0)
    train_x = scaler.transform(st, feats0)
    readout = logistic.fit_ridge(train_x, labels, num_classes=12, alpha=10.0)
    acc = float(
        jnp.mean((logistic.predict(readout, train_x) == labels).astype(jnp.float32))
    )
    log(f"setup done: mean_weight={mean_weight:.6f} fit-accuracy={acc:.3f}")

    # --- the timed end-to-end inference path -------------------------------
    def e2e(audio_batch):
        spikes = featurize_batch(audio_batch, fcfg)
        feats = res.extract_features(params, spikes, keys)
        return logistic.predict(readout, scaler.transform(st, feats))

    e2e_jit = jax.jit(e2e)
    preds = e2e_jit(audio)
    preds.block_until_ready()  # compile + warmup

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        preds = e2e_jit(audio)
        preds.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    rate = n / best
    rate_per_chip = rate / n_chips
    e2e_acc = float(jnp.mean((preds == labels).astype(jnp.float32)))
    log(f"e2e: {n} utterances in {best:.3f}s = {rate:.1f} utt/s "
        f"({rate_per_chip:.1f}/chip), closed-loop acc={e2e_acc:.3f}, "
        f"times={['%.3f' % t for t in times]}")

    baseline_rate_per_chip = 2400.0 / 10.0 / 8.0  # north star: 2400 in 10s on 8 chips
    print(json.dumps({
        "metric": "utterances_per_sec_per_chip_e2e",
        "value": round(rate_per_chip, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(rate_per_chip / baseline_rate_per_chip, 2),
    }))


if __name__ == "__main__":
    main()
