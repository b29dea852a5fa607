"""Crash-resume of the sharded featurization writer (SURVEY.md 5.4).

VERDICT round-1 item 5: kill the run mid-featurization, rerun, and the
final dataset must be complete and correct with NO recompute of finished
shards.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from lsm_tpu.config import FrontendConfig, PipelineConfig, ReservoirConfig
from lsm_tpu.io import dataset
from lsm_tpu.io.sharded import (
    ShardedSpikeDataset,
    ShardedSpikeDatasetWriter,
)
from lsm_tpu import pipeline


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        frontend=FrontendConfig(n_filters=32),
        commands=("a", "b", "c"),
        batch_size=8,
        max_samples_per_class=10,
    )


@pytest.fixture(scope="module")
def corpus_dir(cfg, tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    dataset.write_synthetic_corpus(d, cfg.commands, n_per_class=10, seed=3)
    return d


def test_writer_journal_resume(tmp_path):
    """Unit-level: journal replay skips complete shards, drops the buffer."""
    root = tmp_path / "ds"
    w = ShardedSpikeDatasetWriter(root, shard_size=4)
    x = np.arange(10 * 2 * 3, dtype=np.uint8).reshape(10, 2, 3) % 2
    y = np.arange(10, dtype=np.int32)
    w.append(x[:6], y[:6], np.arange(6))
    # 1 shard of 4 flushed; 2 samples buffered. Simulate a crash: no close().
    assert (root / "journal.jsonl").exists()
    assert not (root / "manifest.json").exists()

    w2 = ShardedSpikeDatasetWriter(root, shard_size=4, resume=True)
    assert w2.resume_file_index == 3          # last sample in the flushed shard
    assert len(w2.completed_shards()) == 1
    # Caller resumes from file 4: re-append 4..9.
    w2.append(x[4:], y[4:], np.arange(4, 10))
    manifest = w2.close()
    assert manifest["num_samples"] == 10

    ds = ShardedSpikeDataset(root)
    full = ds.load_all()
    np.testing.assert_array_equal(full.x_spikes, x)
    np.testing.assert_array_equal(full.y_labels, y)


def test_writer_fresh_run_clears_stale_state(tmp_path):
    root = tmp_path / "ds"
    w = ShardedSpikeDatasetWriter(root, shard_size=2)
    x = np.zeros((4, 2, 3), np.uint8)
    w.append(x, np.zeros(4, np.int32), np.arange(4))
    w.close()
    # A non-resume writer starts from scratch.
    w2 = ShardedSpikeDatasetWriter(root, shard_size=2, resume=False)
    assert w2.resume_file_index == -1
    assert not (root / "manifest.json").exists()


def test_resume_rejects_different_fingerprint(tmp_path):
    """Shards written under one config/input list must NOT be reused when
    either changes — a mismatched fingerprint forces a fresh run."""
    root = tmp_path / "ds"
    x = np.zeros((6, 2, 3), np.uint8)
    y = np.zeros(6, np.int32)

    w = ShardedSpikeDatasetWriter(root, shard_size=4, fingerprint="cfgA")
    w.append(x, y, np.arange(6))
    # crash (no close): 1 shard flushed under cfgA

    # Same fingerprint: resume anchors after the flushed shard.
    w2 = ShardedSpikeDatasetWriter(root, shard_size=4, resume=True,
                                   fingerprint="cfgA")
    assert w2.resume_file_index == 3

    # Different fingerprint (config or file list changed): start fresh.
    w3 = ShardedSpikeDatasetWriter(root, shard_size=4, resume=True,
                                   fingerprint="cfgB")
    assert w3.resume_file_index == -1
    assert w3.completed_shards() == []


def test_pipeline_resume_no_recompute(cfg, corpus_dir, tmp_path, monkeypatch):
    """Kill create_spike_dataset mid-run; rerun; complete + no recompute."""
    out = tmp_path / "sharded"

    # Full run (ground truth) into a separate directory.
    truth = pipeline.create_spike_dataset(
        cfg, corpus_dir, sharded_output=tmp_path / "truth", shard_size=8,
        mesh=None,
    )

    # Interrupted run: blow up after the second batch's append.
    calls = {"n": 0}
    orig_append = ShardedSpikeDatasetWriter.append

    def bomb(self, *a, **k):
        if calls["n"] >= 2:
            raise KeyboardInterrupt("simulated kill -9")
        calls["n"] += 1
        return orig_append(self, *a, **k)

    monkeypatch.setattr(ShardedSpikeDatasetWriter, "append", bomb)
    with pytest.raises(KeyboardInterrupt):
        pipeline.create_spike_dataset(
            cfg, corpus_dir, sharded_output=out, shard_size=8, mesh=None
        )
    monkeypatch.setattr(ShardedSpikeDatasetWriter, "append", orig_append)

    # Shards flushed before the kill must not be rewritten on resume.
    pre = {p.name: p.stat().st_mtime_ns for p in out.glob("shard_*.npz")}
    assert pre, "the interrupted run should have flushed at least one shard"

    ds = pipeline.create_spike_dataset(
        cfg, corpus_dir, sharded_output=out, shard_size=8, mesh=None
    )
    post = {p.name: p.stat().st_mtime_ns for p in out.glob("shard_*.npz")}
    for name, mtime in pre.items():
        assert post[name] == mtime, f"{name} was rewritten on resume"

    np.testing.assert_array_equal(ds.x_spikes, truth.x_spikes)
    np.testing.assert_array_equal(ds.y_labels, truth.y_labels)
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["num_samples"] == truth.x_spikes.shape[0]


def test_reader_journal_fallback_truncated_tail(tmp_path, rng):
    """Reading a crashed run directly (no manifest) must tolerate the two
    crash artifacts: a truncated trailing journal line and a journaled
    shard whose file never hit disk — the valid prefix is returned."""
    from lsm_tpu.io.sharded import ShardedSpikeDataset, ShardedSpikeDatasetWriter

    root = tmp_path / "ds"
    w = ShardedSpikeDatasetWriter(root, shard_size=8)
    x = (rng.random((16, 4, 8)) < 0.3).astype(np.uint8)
    y = rng.integers(0, 3, 16).astype(np.int32)
    w.append(x, y)          # flushes two complete shards of 8
    # Crash before close(): no manifest. Simulate a torn journal append.
    (root / "journal.jsonl").open("a").write('{"file": "shard_0000')

    ds = ShardedSpikeDataset(root)
    assert ds.is_partial
    assert ds.num_samples == 16
    np.testing.assert_array_equal(ds.load_all().x_spikes, x)

    # A journal entry whose shard file is missing ends the valid prefix.
    (root / "shard_00001.npz").unlink()
    ds2 = ShardedSpikeDataset(root)
    assert ds2.num_samples == 8
    np.testing.assert_array_equal(ds2.load_all().x_spikes, x[:8])


def test_writer_meta_round_trip(tmp_path):
    """Writer-recorded metadata (frontend + vocabulary) must survive the
    manifest, the journal-fallback read of a crashed run, AND a resume —
    the streaming trainer recovers the TRUE featurization from it."""
    from lsm_tpu.config import frontend_from_dict, frontend_to_dict

    fcfg = FrontendConfig(n_filters=64, filterbank="mel")
    meta = {"frontend": frontend_to_dict(fcfg), "class_names": ["a", "b"]}
    root = tmp_path / "ds"
    w = ShardedSpikeDatasetWriter(root, shard_size=4, fingerprint="cfgA",
                                  meta=meta)
    x = np.zeros((6, 2, 3), np.uint8)
    w.append(x, np.zeros(6, np.int32), np.arange(6))
    # Crash (no close): journal-fallback reader still sees the meta.
    ds_partial = ShardedSpikeDataset(root)
    assert ds_partial.is_partial
    assert ds_partial.meta["class_names"] == ["a", "b"]

    # Resume under the same fingerprint: the stored meta wins over the
    # caller's copy (same fingerprint == same featurization).
    w2 = ShardedSpikeDatasetWriter(root, shard_size=4, resume=True,
                                   fingerprint="cfgA",
                                   meta={"class_names": ["x"]})
    assert w2.meta["class_names"] == ["a", "b"]
    w2.append(x[4:], np.zeros(2, np.int32), np.arange(4, 6))
    w2.close()

    ds = ShardedSpikeDataset(root)
    assert ds.meta["class_names"] == ["a", "b"]
    rt = frontend_from_dict(ds.meta["frontend"])
    assert rt == fcfg
    assert isinstance(rt.spike_thresholds, tuple)
    # Unknown keys (newer writer) are tolerated.
    assert frontend_from_dict({**ds.meta["frontend"], "new_knob": 1}) == fcfg


def test_pipeline_records_corpus_meta(cfg, corpus_dir, tmp_path):
    """create_spike_dataset must record the frontend + vocabulary so
    --streaming-fit consumers never assume defaults."""
    from lsm_tpu.config import frontend_from_dict

    out = tmp_path / "sharded"
    pipeline.create_spike_dataset(
        cfg, corpus_dir, sharded_output=out, shard_size=8, mesh=None
    )
    ds = ShardedSpikeDataset(out)
    assert tuple(ds.meta["class_names"]) == cfg.commands
    assert frontend_from_dict(ds.meta["frontend"]) == cfg.frontend
