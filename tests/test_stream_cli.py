"""Streaming serving CLI (stream_kws.py + tools/calibrate_continuous.py):
train a bundle, calibrate it for continuous mode, and serve a WAV
directory as parallel streams in both engines — the full deployment path
for BASELINE configs[4]'s streaming KWS mode."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=420,
    )


def test_stream_kws_rejects_nonpositive_max_streams(tmp_path):
    # Pure-argparse guard: fires before the bundle load, so a 0-slot pool
    # fails with a clear message instead of an opaque np.stack([]) error
    # (or an engine-build failure) minutes later.
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "missing.npz",
         "--data-dir", str(tmp_path), "--pool", "--max-streams", "0"],
        tmp_path,
    )
    assert r.returncode == 1
    assert "--max-streams must be >= 1" in r.stderr


@pytest.mark.slow
def test_stream_kws_cli_end_to_end(tmp_path):
    from lsm_tpu.io.dataset import write_synthetic_corpus

    # Subset of the reference vocabulary: main.py indexes cfg.commands and
    # skips missing class dirs, so a 4-class corpus trains a 12-class
    # readout over classes 0-3.
    classes = ("yes", "no", "up", "visual")
    corpus = tmp_path / "corpus"
    write_synthetic_corpus(corpus, classes, n_per_class=8)

    small = ["--num-neurons", "256", "--num-output-neurons", "128",
             "--batch-size", "32", "--n-filters", "32",
             "--samples-per-class", "8"]
    r = _run(
        [str(REPO / "main.py"), "--data-dir", str(corpus), *small,
         "--save-model", "m.npz"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "m.npz").exists()

    # Continuous calibration produces a feature_mode-tagged bundle.
    r = _run(
        [str(REPO / "tools" / "calibrate_continuous.py"),
         "--model", "m.npz", "--out", "mc.npz",
         "--data-dir", str(corpus), "--samples-per-class", "8"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    from lsm_tpu.io import model as model_io

    mc = model_io.load_model(tmp_path / "mc.npz")
    assert mc.feature_mode == "continuous"
    # The calibration's distribution-shaping knobs ride in the bundle so
    # serving cannot silently mismatch them.
    assert mc.continuous_params["chunk_len"] == 1600
    assert mc.continuous_params["norm_decay_db_per_bin"] == 0.1

    # Exact-mode serving: predictions + accuracy line. The trailing window
    # after the last chunk IS the batch window, so accuracy on the training
    # corpus should be near the pipeline's (synthetic corpus: ~1.0).
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "m.npz",
         "--data-dir", str(corpus), "--single-device",
         "--diagnostics-every", "5", "--metrics-out", "serve.jsonl"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "exact mode" in r.stdout
    assert "Accuracy vs directory labels" in r.stdout
    # Live reservoir health report (run_network_diagnostics thresholds
    # on the served streams' trailing windows).
    assert "SERVING RESERVOIR DIAGNOSTICS" in r.stdout
    assert "STATUS:" in r.stdout
    # Structured serving metrics (same MetricLogger schema as the stages).
    import json

    recs = [json.loads(l) for l in
            (tmp_path / "serve.jsonl").read_text().splitlines()]
    by_name = {rec["metric"]: rec for rec in recs}
    assert "serving_participation_pct" in by_name
    assert by_name["serving_participation_pct"]["regime"]
    assert by_name["serving_stream_chunks_per_sec"]["value"] > 0
    assert by_name["serving_stream_chunks_per_sec"]["wire"] == "f32"
    assert 0.8 < by_name["serving_accuracy"]["value"] <= 1.0
    out = np.load(tmp_path / "stream_predictions.npz", allow_pickle=False)
    assert len(out["predictions"]) == 32
    acc = float((out["predictions"] == out["labels"]).mean())
    assert acc > 0.8, acc

    # Continuous serving with the calibrated bundle.
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "mc.npz",
         "--data-dir", str(corpus), "--mode", "continuous",
         "--single-device", "--output", "cont.npz"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "continuous mode" in r.stdout
    cont = np.load(tmp_path / "cont.npz", allow_pickle=False)
    acc_c = float((cont["predictions"] == cont["labels"]).mean())
    assert acc_c > 0.6, acc_c

    # mu-law wire format: the serving answers must not move more than the
    # codec's quantization would allow on this easy corpus (same bundle,
    # same audio, uint8 wire decoded on device).
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "m.npz",
         "--data-dir", str(corpus), "--single-device",
         "--wire", "ulaw", "--check", "--output", "ulaw.npz"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    uw = np.load(tmp_path / "ulaw.npz", allow_pickle=False)
    acc_u = float((uw["predictions"] == uw["labels"]).mean())
    assert acc_u > 0.8, acc_u

    # Compact decision egress (--compact, step_compact): same wire, same
    # bundle -> predictions BIT-EQUAL to the full-logits run, plus a
    # finite positive top-1/top-2 margin per stream in the output file.
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "m.npz",
         "--data-dir", str(corpus), "--single-device",
         "--wire", "ulaw", "--compact", "--check",
         "--output", "compact.npz"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    cw = np.load(tmp_path / "compact.npz", allow_pickle=False)
    np.testing.assert_array_equal(cw["predictions"], uw["predictions"])
    assert cw["margins"].shape == (32,)
    assert np.isfinite(cw["margins"]).all() and (cw["margins"] >= 0).all()

    # Session-churn pool mode: 32 sessions over 8 slots (4 generations of
    # admit/finish churn), same ulaw wire. Exact-mode per-slot state
    # depends only on that session's own audio since its admit reset, so
    # every decision — AND its compact margin — must be bit-equal to the
    # static one-slot-per-file runs above, whatever slot each session
    # landed in. Periodic pool checkpoints persist the session table.
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "m.npz",
         "--data-dir", str(corpus), "--single-device", "--pool",
         "--max-streams", "8", "--wire", "ulaw", "--check",
         "--diagnostics-every", "5",
         "--save-state", "pool_state.npz", "--save-state-every", "7",
         "--output", "pool.npz"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "32 sessions over 8 pool slots" in r.stdout
    assert "SERVING RESERVOIR DIAGNOSTICS" in r.stdout
    pw = np.load(tmp_path / "pool.npz", allow_pickle=False)
    np.testing.assert_array_equal(pw["predictions"], uw["predictions"])
    np.testing.assert_array_equal(pw["margins"], cw["margins"])
    from lsm_tpu.io.serving_state import read_snapshot_meta

    pm = read_snapshot_meta(tmp_path / "pool_state.npz")["pool"]
    assert sorted(int(i) for i in pm["free"]) == list(range(8))
    assert pm["sessions"] == []  # every session finished before the save
    # Lazy admit-time decode (round 5): pool sessions load at admit, so
    # a corrupt WAV is discovered mid-serve — it must be skipped (loud
    # stderr, no output row) while every good session's decision stays
    # bit-equal; host residency is O(slots) by construction.
    bad = sorted(corpus.rglob("*.wav"))[-1].parent / "zzz_corrupt.wav"
    bad.write_bytes(b"fLaC" + b"\x00" * 64)
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "m.npz",
         "--data-dir", str(corpus), "--single-device", "--pool",
         "--max-streams", "8", "--wire", "ulaw",
         "--output", "pool_bad.npz"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "unsupported audio container: FLAC" in r.stderr
    pb = np.load(tmp_path / "pool_bad.npz", allow_pickle=False)
    assert str(bad) not in set(pb["files"].tolist())
    by_file = dict(zip(pb["files"].tolist(), pb["predictions"].tolist()))
    for f, p in zip(pw["files"].tolist(), pw["predictions"].tolist()):
        assert by_file[f] == p, f"lazy-pool decision changed for {f}"
    bad.unlink()

    # Guards: pool mode is a fresh-session replay harness.
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "m.npz",
         "--data-dir", str(corpus), "--single-device", "--pool",
         "--max-streams", "8", "--restore-state", "pool_state.npz"],
        tmp_path,
    )
    assert r.returncode == 1
    assert "StreamPool.restore" in r.stderr

    # Serving-state checkpoint: snapshot after a continuous run, restore
    # into a fresh server process (replaces the demo pre-roll — streams
    # come up already warm), and the restored run still classifies.
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "mc.npz",
         "--data-dir", str(corpus), "--mode", "continuous",
         "--single-device", "--save-state", "state.npz",
         "--save-state-every", "3",   # periodic checkpoints en route
         "--output", "cont2.npz"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Stream state snapshot" in r.stdout
    assert not (tmp_path / "state.npz.tmp").exists()  # atomic rename
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "mc.npz",
         "--data-dir", str(corpus), "--mode", "continuous",
         "--single-device", "--restore-state", "state.npz",
         "--output", "warm.npz"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Stream state restored" in r.stdout
    warm = np.load(tmp_path / "warm.npz", allow_pickle=False)
    acc_w = float((warm["predictions"] == warm["labels"]).mean())
    assert acc_w > 0.6, acc_w
    # Identity validation: a continuous snapshot cannot enter the exact
    # engine (or a bundle with different weights).
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "m.npz",
         "--data-dir", str(corpus), "--single-device",
         "--restore-state", "state.npz"],
        tmp_path,
    )
    assert r.returncode == 1
    assert "Error restoring state" in r.stderr

    # Guard: a batch bundle cannot serve continuous mode (and vice versa).
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "m.npz",
         "--data-dir", str(corpus), "--mode", "continuous",
         "--single-device"],
        tmp_path,
    )
    assert r.returncode == 1
    assert "calibrate_continuous" in r.stderr
    r = _run(
        [str(REPO / "stream_kws.py"), "--model", "mc.npz",
         "--data-dir", str(corpus), "--mode", "exact", "--single-device"],
        tmp_path,
    )
    assert r.returncode == 1
