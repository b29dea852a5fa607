#!/usr/bin/env python
"""End-to-end benchmark: featurize + simulate + classify utterances on TPU.

North-star metric (BASELINE.json): utterances/sec/chip for the full
pipeline — raw 1 s audio -> gammatone spike encoding -> 1000-neuron LIF
reservoir -> standardized features -> readout classification — on the
12-class Speech Commands test-split size (2400 utterances). The reference
target is <10 s on a v5e-8 slice, i.e. 30 utt/s/chip; vs_baseline is the
ratio of the measured rate to that target.

Timing methodology (CLAUDE.md): the timed quantity is a jitted SCALAR
reduction over the predictions pulled to host — `block_until_ready` on a
large buffer can return early under the TPU relay, a 4-byte scalar D2H
cannot. Device-only rates come from the AMORTIZED probe: K iterations of
the pipeline (or K engine steps, via steps_fused) run as ONE lax.scan
dispatch, so the relay dispatch floor (15-35 ms, drifts with tunnel
load) is paid once and (wall - floor)/K is reproducible across sessions
— a single-step floor subtraction is noise whenever the device time is
a few ms (r4 verdict weak #1). Numbers reported:
  - hot path: device-resident audio -> predictions (the headline), raw
    single-dispatch AND amortized device-only;
  - cold path: WAV files on disk -> native C++ decode -> H2D -> predictions
    (the whole-system number including I/O);
  - streaming/continuous serving steps (raw + amortized device-only);
  - scaled configs: 256-filter gammatone (configs[2]) and 10k-neuron
    block-sparse (configs[3]) rates.
With more than one device the batch shards over the mesh data axis
(utt/s/chip then measures scaling efficiency).

Prints exactly ONE JSON line on stdout; all narration goes to stderr.
Uses a synthetic corpus when Speech Commands is not on disk (same compute).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-test", type=int, default=2400)
    parser.add_argument("--n-filters", type=int, default=128)
    parser.add_argument("--filterbank", default="gammatone",
                        choices=["mel", "gammatone"])
    parser.add_argument("--gammatone-method", default="iir",
                        choices=["iir", "iir-xla", "fft"])
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--skip-cold", action="store_true",
                        help="Skip the disk->device cold-path measurement.")
    parser.add_argument("--amortize-steps", type=int, default=8,
                        help="K for the amortized device-only rows: K "
                             "consecutive steps run as ONE dispatch "
                             "(lax.scan), so the relay floor is paid once "
                             "and (wall - floor)/K is reproducible across "
                             "sessions (a single-step floor subtraction "
                             "is noise when the device time is a few ms).")
    parser.add_argument("--skip-scaled", action="store_true",
                        help="Skip the BASELINE configs[2]/[3] rows "
                             "(256-filter gammatone, 10k block-sparse).")
    parser.add_argument("--streams", type=int, default=1024,
                        help="Stream count for the serving rows.")
    args = parser.parse_args()

    from lsm_tpu.cli.common import enable_compile_cache, honor_jax_platforms_env
    from lsm_tpu.parallel.mesh import maybe_init_distributed_from_env

    honor_jax_platforms_env()
    maybe_init_distributed_from_env()   # multi-host DCN join, env-gated —
    # same startup contract as every CLI entry point (cli.common
    # .setup_logging): without it a bench process in a
    # LSM_TPU_COORDINATOR launch would see only local chips (wrong
    # per-chip rates) while its peers hang in the first collective.
    enable_compile_cache()   # setup compiles are untimed; warm runs timed

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsm_tpu.config import FEATURE_SETS, FrontendConfig, ReservoirConfig
    from lsm_tpu.io.dataset import synthetic_audio_batch, write_synthetic_corpus
    from lsm_tpu.io.wav import load_audio_batch
    from lsm_tpu.models import reservoir as res
    from lsm_tpu.models.frontend import featurize_batch
    from lsm_tpu.models.calibration import calibrate_weight
    from lsm_tpu.parallel import mesh as meshlib
    from lsm_tpu.readout import logistic, scaler

    n_chips = jax.device_count()
    log(f"devices: {jax.devices()} ({n_chips} chip(s))")
    mesh = meshlib.auto_mesh()

    fcfg = FrontendConfig(
        n_filters=args.n_filters,
        filterbank=args.filterbank,
        gammatone_method=args.gammatone_method,
    )
    rcfg = ReservoirConfig()
    keys = tuple(FEATURE_SETS["original"])

    n = args.n_test
    if mesh is not None and n % n_chips:
        n = -(-n // n_chips) * n_chips
    log(f"generating {n} synthetic utterances ...")
    audio_np, labels_np = synthetic_audio_batch(
        n_per_class=-(-n // 12), n_classes=12, seed=42
    )
    audio_np = audio_np[:n]
    labels_np = labels_np[:n]

    def place(x):
        return meshlib.shard_batch(x, mesh) if mesh is not None else jnp.asarray(x)

    # Under a mesh the Pallas kernels must run per-shard via shard_map
    # (Mosaic custom calls have no GSPMD partitioning rule).
    if mesh is not None:
        from lsm_tpu.parallel.sharded import extract_features_dp, featurize_dp

        def _feat(a):
            return featurize_dp(a, fcfg, mesh)

        def _extract(p, s):
            return extract_features_dp(p, s, keys, mesh)
    else:
        def _feat(a):
            return featurize_batch(a, fcfg)

        def _extract(p, s):
            return res.extract_features(p, s, keys)

    audio = place(audio_np)
    labels = place(labels_np)

    # --- setup (not timed): calibrate, build reservoir, fit readout --------
    spikes0 = _feat(audio)
    _, mean_weight = calibrate_weight(rcfg, spikes0, multiplier=0.6)
    params = res.init_reservoir(rcfg, n_channels=args.n_filters,
                                mean_weight=mean_weight)
    if mesh is not None:
        params = jax.device_put(params, meshlib.replicated(mesh))
    feats0 = _extract(params, spikes0)
    st = scaler.fit_scaler(feats0)
    train_x = scaler.transform(st, feats0)
    readout = logistic.fit_ridge(train_x, labels, num_classes=12, alpha=10.0)
    acc = float(
        jnp.mean((logistic.predict(readout, train_x) == labels).astype(jnp.float32))
    )
    log(f"setup done: mean_weight={mean_weight:.6f} fit-accuracy={acc:.3f}")

    # --- the timed end-to-end inference path -------------------------------
    # Returns a SCALAR (the correct-prediction count): pulling it to host
    # forces the whole computation and cannot return early under the relay.
    # Weights ride as jit ARGUMENTS (CLAUDE.md: closed-over weight arrays
    # become HLO literal constants — per-trace uploads to the remote
    # compile service, and a large reservoir would overflow it).
    @jax.jit
    def e2e_correct(p, ro, sc, audio_batch, label_batch):
        spikes = _feat(audio_batch)
        feats = _extract(p, spikes)
        preds = logistic.predict(ro, scaler.transform(sc, feats))
        return jnp.sum((preds == label_batch).astype(jnp.int32))

    n_correct = int(e2e_correct(params, readout, st, audio, labels))
    e2e_acc = n_correct / n

    # Relay dispatch floor: a trivial jitted scalar dispatch costs the
    # same per-dispatch round-trip (~15-35 ms, drifts with tunnel load)
    # as the real program. Reported so the headline can be read as
    # floor + device time; on a local TPU host the floor is ~0.
    @jax.jit
    def _nop(x):
        return jnp.sum(x)

    nop_arg = jnp.zeros((8,), jnp.float32)
    float(_nop(nop_arg))                          # compile + warmup
    floor = min(
        _timed(lambda: float(_nop(nop_arg))) for _ in range(args.repeats)
    )

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        c = int(e2e_correct(params, readout, st, audio, labels))  # scalar D2H = the barrier
        times.append(time.perf_counter() - t0)
        assert c == n_correct
    best = min(times)
    rate = n / best
    rate_per_chip = rate / n_chips
    log(f"e2e hot: {n} utterances in {best:.3f}s = {rate:.1f} utt/s "
        f"({rate_per_chip:.1f}/chip), closed-loop acc={e2e_acc:.3f}, "
        f"times={['%.3f' % t for t in times]}; dispatch floor "
        f"{floor * 1e3:.1f} ms")

    # Amortized device-only rate: K full pipelines inside ONE lax.scan
    # dispatch, so the relay floor is paid once and (wall - floor)/K is a
    # per-pipeline device time whose floor-drift error shrinks by 1/K —
    # the r4->r5 fix for device-only rows that swung 2x round-over-round
    # on an unchanged wall (single-step floor subtraction at a few-ms
    # residual is below the floor's session drift). The isnan select
    # never fires (carry is a finite count) so every iteration is
    # bit-identical to e2e_correct, but the loop-carried dependence
    # stops XLA hoisting the loop-invariant pipeline out of the scan.
    K = max(2, args.amortize_steps)

    def guarded_scan(body_fn, k):
        """ONE definition of the amortized-probe scaffolding (the timing
        methodology is load-bearing — see CLAUDE.md round 5): a jitted
        k-iteration lax.scan whose body receives the first array argument
        through a never-taken `isnan(carry)` select — bit-identical
        inputs every iteration, but a real loop-carried dependence, so
        XLA cannot hoist the loop-invariant pipeline out of the scan.
        `body_fn(x_guarded, *rest) -> f32 scalar`; returns all k scalars."""
        @jax.jit
        def run(x, *rest):
            alt = (1 - x) if x.dtype == jnp.uint8 else (x + 1)

            def body(carry, _):
                c = body_fn(jnp.where(jnp.isnan(carry), alt, x), *rest)
                return c.astype(jnp.float32), c

            _, cs = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return cs

        return run

    def _amortized_step_s(run_k, k):
        """Best amortized per-iteration seconds for a k-iteration
        one-dispatch program, floor-subtracted once. MIN over repeats,
        not median: the measured quantity is device time, which host
        scheduling contention on this 1-core VM can only inflate (a
        concurrent process measured +50% on the median while the min
        held) — same rationale as the floor's own min. Returns None when
        the residual is at/below measurement resolution (the CLAUDE.md
        floor-adjusted-rate rule: report null, never a clamped rate)."""
        run_k()                                    # compile + warmup
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            run_k()
            ts.append(time.perf_counter() - t0)
        step = (min(ts) - floor) / k
        return step if step >= 1e-4 else None

    def _e2e_count(a, p, ro, sc, label_batch):
        spikes = _feat(a)
        feats = _extract(p, spikes)
        preds = logistic.predict(ro, scaler.transform(sc, feats))
        return jnp.sum((preds == label_batch).astype(jnp.int32))

    e2e_correct_k = guarded_scan(_e2e_count, K)
    counts = np.asarray(e2e_correct_k(audio, params, readout, st, labels))
    if not (counts == n_correct).all():
        # The scan and the single-shot program are separately compiled
        # HLO; a near-tie argmax could in principle flip under different
        # fusion choices. That is measurement-irrelevant — warn, never
        # abort (the driver contract is ONE JSON line no matter what).
        log(f"note: amortized-scan counts {counts.tolist()} != "
            f"single-dispatch {n_correct} (near-tie argmax under "
            "different XLA fusions); timing is unaffected")
    hot_step_s = _amortized_step_s(
        lambda: np.asarray(
            e2e_correct_k(audio, params, readout, st, labels)
        ),
        K,
    )
    device_rate = (n / hot_step_s) if hot_step_s else None
    log(f"e2e hot amortized (K={K} pipelines, one dispatch): "
        + (f"{hot_step_s * 1e3:.1f} ms/pipeline -> device-only "
           f"{device_rate:.0f} utt/s" if hot_step_s
           else "below floor resolution"))

    # --- cold path: disk -> native decode -> H2D -> predictions ------------
    # Instrumented per phase (decode / H2D / compute) so rounds compare
    # phase rates: the raw total drifts with relay-transfer load and is
    # NOT comparable across sessions (VERDICT r3 item 8).
    cold_rate = None
    cold_split = {}
    if not args.skip_cold:
        n_cold = min(n, 1200)
        with tempfile.TemporaryDirectory() as td:
            corpus = Path(td) / "corpus"
            classes = [f"c{i:02d}" for i in range(12)]
            write_synthetic_corpus(corpus, classes, n_per_class=n_cold // 12,
                                   seed=42)
            files = sorted(corpus.rglob("*.wav"))[:n_cold]
            # Labels derived from each file's class directory (sorted rglob
            # is class-major over c00..c11; labels_np is NOT aligned to it).
            class_idx = {c: i for i, c in enumerate(classes)}
            all_labels = np.asarray(
                [class_idx[f.parent.name] for f in files], np.int32
            )

            # H2D forcing barrier: a jitted scalar reduction over the staged
            # batch (block_until_ready on a large buffer can return early
            # under the relay — CLAUDE.md timing methodology).
            @jax.jit
            def _force(x):
                return jnp.sum(x)

            def cold_run(wire="int16"):
                """One decode->H2D->compute pass; returns per-phase seconds
                and the kept-row count."""
                t0 = time.perf_counter()
                # Production wire: the native decoder memcpys these PCM16
                # WAVs straight into an int16 batch (no float round-trip)
                # and the jitted program converts on device — bit-equal
                # to the f32 path at half the H2D bytes, which dominate
                # the cold path through the relay (io/wav.py docstring).
                # wire="ulaw" is the opt-in uint8 G.711 wire: half the
                # bytes again, lossy, measured accuracy-neutral.
                batch, kept, _ = load_audio_batch(
                    files, fcfg.sample_rate, fcfg.duration, dtype=wire
                )
                lab_cold = all_labels[kept]
                pad = (-batch.shape[0]) % n_chips if mesh is not None else 0
                if pad:
                    batch = np.pad(batch, ((0, pad), (0, 0)))
                    lab_cold = np.pad(lab_cold, (0, pad))
                t1 = time.perf_counter()
                batch_dev = place(batch)
                lab_dev = place(lab_cold)
                float(_force(batch_dev))
                t2 = time.perf_counter()
                int(e2e_correct(params, readout, st, batch_dev, lab_dev))
                t3 = time.perf_counter()
                return t1 - t0, t2 - t1, t3 - t2, len(kept), batch.nbytes

            cold_run()                             # warmup (compiles _force)
            t_dec, t_h2d, t_cmp, n_kept, nbytes = cold_run()
            dt = t_dec + t_h2d + t_cmp
            # Opt-in uint8 mu-law wire (--audio-wire ulaw): half the H2D
            # bytes again. Separate program (uint8 ingest), so warm it up
            # before the timed pass.
            cold_run("ulaw")
            u_dec, u_h2d, u_cmp, u_kept, u_bytes = cold_run("ulaw")
            u_dt = u_dec + u_h2d + u_cmp
        cold_rate = n_kept / dt
        cold_split = {
            "cold_decode_s": round(t_dec, 3),
            "cold_h2d_s": round(t_h2d, 3),
            "cold_compute_s": round(t_cmp, 3),
            "cold_decode_files_per_sec": round(n_kept / max(t_dec, 1e-9), 1),
            # Floor-adjusted rates are meaningless when the phase time sits
            # at/under the dispatch floor — report null instead of an
            # absurd 1e16 rate (same rule as the streaming device-only
            # extras below).
            "cold_h2d_mbytes_per_sec": (
                round(nbytes / 1e6 / (t_h2d - floor), 1)
                if t_h2d - floor >= 1e-4 else None
            ),
            "cold_compute_utt_per_sec": (
                round(n_kept / (t_cmp - floor), 1)
                if t_cmp - floor >= 1e-4 else None
            ),
            "cold_ulaw_utt_per_sec_per_chip": round(
                u_kept / u_dt / n_chips, 2
            ),
            "cold_ulaw_decode_s": round(u_dec, 3),
            "cold_ulaw_h2d_s": round(u_h2d, 3),
            "cold_ulaw_compute_s": round(u_cmp, 3),
        }
        log(f"e2e cold (disk+decode+H2D+classify): {n_kept} utterances "
            f"in {dt:.3f}s = {cold_rate:.1f} utt/s "
            f"({cold_rate / n_chips:.1f}/chip); split: decode {t_dec:.3f}s, "
            f"H2D {t_h2d:.3f}s ({cold_split['cold_h2d_mbytes_per_sec']} MB/s "
            f"floor-adjusted), compute {t_cmp:.3f}s")
        log(f"e2e cold, ulaw wire ({u_bytes / 1e6:.1f} MB vs "
            f"{nbytes / 1e6:.1f} MB int16): {u_kept} utterances in "
            f"{u_dt:.3f}s = {u_kept / u_dt:.1f} utt/s; split: decode "
            f"{u_dec:.3f}s, H2D {u_h2d:.3f}s, compute {u_cmp:.3f}s")

    # --- streaming serving capacity (BASELINE configs[4]) ------------------
    # Exact sliding-window mode and continuous (state-carrying) mode at
    # 1024 parallel 100 ms streams, device-resident chunks (the H2D
    # ingest is relay-bound and measured separately by
    # tools/bench_continuous.py). Guarded: a streaming failure must not
    # cost the headline metric.
    streaming_extra = {}
    try:
        from lsm_tpu.models.continuous import ContinuousKWS
        from lsm_tpu.models.streaming import StreamingKWS
        from lsm_tpu.readout.scaler import ScalerState

        ns, chunk_len = args.streams, 1600
        if mesh is not None and ns % n_chips:
            ns = -(-ns // n_chips) * n_chips
        d = train_x.shape[1]
        sc = ScalerState(mean=jnp.zeros((d,), jnp.float32),
                         scale=jnp.ones((d,), jnp.float32))
        rng_s = np.random.default_rng(0)
        chunk_np = (rng_s.standard_normal((ns, chunk_len)) * 0.1).astype(
            np.float32
        )
        chunk = (
            meshlib.shard_batch(chunk_np, mesh)
            if mesh is not None else jnp.asarray(chunk_np)
        )
        chunk.block_until_ready()
        for name, kws in (
            ("streaming_exact", StreamingKWS(
                params, readout, sc, fcfg, n_streams=ns, mesh=mesh)),
            ("streaming_continuous", ContinuousKWS(
                params, readout, sc, fcfg, n_streams=ns,
                chunk_len=chunk_len, mesh=mesh)),
        ):
            kws.step(chunk)                     # compile + warmup
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                kws.step(chunk)
                ts.append(time.perf_counter() - t0)
            med = sorted(ts)[len(ts) // 2]
            streaming_extra[f"{name}_chunks_per_sec_per_chip"] = round(
                ns / med / n_chips, 1
            )
            # Device-only rate via the amortized probe: K steps as ONE
            # lax.scan dispatch (engine.steps_fused, state advance
            # bit-equal to K step() calls), floor paid once -> the
            # device step time is reproducible across relay sessions.
            # The old single-step floor subtraction swung 2x between
            # rounds on an unchanged wall (VERDICT r4 weak #1). The
            # engine steps are ~2-16 ms, so they need a deeper scan than
            # the 40 ms hot pipeline for the floor drift (measured ~7 ms
            # between back-to-back sessions) to amortize below ~3%:
            # 16*K steps/dispatch. Null if the amortized step is below
            # measurement resolution.
            ks = 16 * K
            step_s = _amortized_step_s(
                lambda: kws.steps_fused(chunk, ks), ks
            )
            streaming_extra[f"{name}_step_ms_amortized"] = (
                round(step_s * 1e3, 2) if step_s else None
            )
            streaming_extra[f"{name}_device_only_chunks_per_sec_per_chip"] = (
                round(ns / step_s / n_chips, 1) if step_s else None
            )
            dev_s = (f"{ns / step_s:,.0f}" if step_s
                     else "below floor resolution")
            log(f"{name}: {ns} streams, median {med * 1e3:.1f} ms/step "
                f"raw -> {ns / med:,.0f} stream-chunks/s; amortized "
                f"{step_s * 1e3:.2f} ms/step (K={ks}, one dispatch) "
                f"-> device-only {dev_s}")

        # Host-ingest serving wall with the production wire format
        # (uint8 mu-law, 1 byte/sample, decoded in the jitted step) —
        # the number an always-on server actually sees. Relay H2D
        # bandwidth varies session-to-session (docs/VALIDATION.md
        # "Streaming serving ingest"), so compare the device_only
        # extras across rounds and treat this as the deployment figure.
        if mesh is None:
            from lsm_tpu.ops.ulaw import encode_ulaw_f32

            wire = encode_ulaw_f32(chunk_np)
            kws_u = ContinuousKWS(params, readout, sc, fcfg, n_streams=ns,
                                  chunk_len=chunk_len)
            kws_u.step(wire)                    # compile + warmup
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                kws_u.step(wire)
                ts.append(time.perf_counter() - t0)
            med = sorted(ts)[len(ts) // 2]
            streaming_extra["streaming_continuous_ulaw_ingest_chunks_per_sec"] = (
                round(ns / med, 1)
            )
            log(f"streaming_continuous ulaw host-ingest: median "
                f"{med * 1e3:.1f} ms/step -> {ns / med:,.0f} chunks/s")

            # Partial-activity ingest at a realistic fleet factor (25%):
            # only active rows cross H2D, silence synthesized on device;
            # bit-equal to the full wire (tests/test_step_active.py).
            k = ns // 4
            idx = np.arange(0, ns, 4)[:k]
            rows = np.ascontiguousarray(wire[idx])
            kws_u.step_active(rows, idx)        # compile + warmup
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                kws_u.step_active(rows, idx)
                ts.append(time.perf_counter() - t0)
            med = sorted(ts)[len(ts) // 2]
            streaming_extra["streaming_continuous_active25_chunks_per_sec"] = (
                round(ns / med, 1)
            )
            log(f"streaming_continuous 25%-active ulaw ingest: median "
                f"{med * 1e3:.1f} ms/step -> {ns / med:,.0f} chunks/s")
    except Exception as exc:  # pragma: no cover
        log(f"streaming bench skipped: {exc}")

    # --- scaled configs (BASELINE configs[2] and configs[3]) ---------------
    # Driver-audited rows for the two scaled configurations so a
    # regression in the 256-filter frontend or the block-sparse 10k
    # reservoir is visible in BENCH_r* (previously they existed only as
    # historical notes in docs/VALIDATION.md). Guarded: a failure here
    # must not cost the headline metric. Single-device (the scaled TP
    # mesh paths are exercised by dryrun_multichip / tools/bench_tp.py).
    scaled_extra = {}
    if not args.skip_scaled and mesh is None:
        try:
            # configs[2]: 256 gammatone filters (the 35-class config's
            # frontend scale) through the full hot pipeline.
            n2 = min(n, 1200)
            fc256 = FrontendConfig(
                n_filters=256, filterbank="gammatone",
                gammatone_method=args.gammatone_method,
            )
            audio2 = jnp.asarray(audio_np[:n2])
            labels2 = jnp.asarray(labels_np[:n2])
            spikes2 = featurize_batch(audio2, fc256)
            _, mw2 = calibrate_weight(rcfg, spikes2, multiplier=0.6)
            p2 = res.init_reservoir(rcfg, n_channels=256, mean_weight=mw2)
            f2 = res.extract_features(p2, spikes2, keys)
            st2 = scaler.fit_scaler(f2)
            ro2 = logistic.fit_ridge(
                scaler.transform(st2, f2), labels2, num_classes=12,
                alpha=10.0,
            )
            K2 = max(2, min(K, 4))

            def _gt256_count(a, p, ro, sc, l_):
                feats = res.extract_features(
                    p, featurize_batch(a, fc256), keys
                )
                preds = logistic.predict(ro, scaler.transform(sc, feats))
                return jnp.sum((preds == l_).astype(jnp.int32))

            gt256_k = guarded_scan(_gt256_count, K2)
            step2 = _amortized_step_s(
                lambda: np.asarray(gt256_k(audio2, p2, ro2, st2, labels2)),
                K2,
            )
            scaled_extra["gt256_utt_per_sec"] = (
                round(n2 / step2, 1) if step2 else None
            )
            log(f"gt256 (configs[2] frontend scale): {n2} utts, "
                + (f"amortized {step2 * 1e3:.1f} ms -> "
                   f"{n2 / step2:,.0f} utt/s" if step2
                   else "below floor resolution"))
        except Exception as exc:  # pragma: no cover
            log(f"gt256 bench skipped: {exc}")
        try:
            # configs[3]: 10k-neuron block-sparse reservoir extraction
            # rate (models/sparse.py + the fused sparse Pallas kernel on
            # TPU). Spike density matches the calibrated regime (~5%).
            from lsm_tpu.models.sparse import (
                extract_features_sparse,
                init_reservoir_sparse,
            )

            n10k = -(-10_000 // 128) * 128
            cfg10k = ReservoirConfig(
                num_neurons=n10k, num_output_neurons=400,
                small_world_k=int(0.10 * n10k * 2), mean_weight=0.002,
            )
            p10k = init_reservoir_sparse(cfg10k, n_channels=args.n_filters)
            Bs = 256
            rng10k = np.random.default_rng(1)
            spikes10k = jnp.asarray(
                (rng10k.random((Bs, args.n_filters, 400)) < 0.05).astype(
                    np.uint8
                )
            )
            K3 = max(2, min(K, 4))

            def _sparse_sum(s, p):
                return jnp.sum(extract_features_sparse(p, s, keys),
                               dtype=jnp.float32)

            sparse10k_k = guarded_scan(_sparse_sum, K3)
            step3 = _amortized_step_s(
                lambda: np.asarray(sparse10k_k(spikes10k, p10k)), K3
            )
            scaled_extra["sparse10k_utt_per_sec"] = (
                round(Bs / step3, 1) if step3 else None
            )
            log(f"sparse10k (configs[3], {n10k} neurons): {Bs} utts, "
                + (f"amortized {step3 * 1e3:.1f} ms -> "
                   f"{Bs / step3:,.0f} utt/s" if step3
                   else "below floor resolution"))
        except Exception as exc:  # pragma: no cover
            log(f"sparse10k bench skipped: {exc}")

    baseline_rate_per_chip = 2400.0 / 10.0 / 8.0  # north star: 2400 in 10s on 8 chips
    extra = {
        "accuracy_closed_loop": round(e2e_acc, 4),
        "n_devices": n_chips,
        "hot_utt_per_sec_total": round(rate, 2),
        "dispatch_floor_ms": round(floor * 1e3, 1),
        "amortize_steps": K,
        "hot_step_ms_amortized": (
            round(hot_step_s * 1e3, 2) if hot_step_s else None
        ),
        "device_only_utt_per_sec": (
            round(device_rate, 2) if device_rate else None
        ),
    }
    extra.update(scaled_extra)
    if cold_rate is not None:
        extra["cold_utt_per_sec_per_chip"] = round(cold_rate / n_chips, 2)
        extra.update(cold_split)
    extra.update(streaming_extra)
    print(json.dumps({
        "metric": "utterances_per_sec_per_chip_e2e",
        "value": round(rate_per_chip, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(rate_per_chip / baseline_rate_per_chip, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
