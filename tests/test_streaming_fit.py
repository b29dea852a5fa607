"""Constant-memory streaming stage-2+3 (pipeline.extract_and_train_streaming).

Oracle: the streamed shifted-Gram ridge statistics must reproduce
fit_ridge on the in-memory scaled feature matrix (readout/streaming_fit.py
derivation), and the fused pipeline path must match the in-memory stage-2
extraction + ridge fit end to end — same split, same calibration subset,
same scaler, prediction-identical readout (VERDICT r3 item 6).
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from lsm_tpu import pipeline
from lsm_tpu.config import FrontendConfig, PipelineConfig
from lsm_tpu.io import dataset
from lsm_tpu.io.artifacts import SpikeDataset
from lsm_tpu.io.sharded import ShardedSpikeDataset, ShardedSpikeDatasetWriter
from lsm_tpu.readout import logistic, scaler as scaler_mod
from lsm_tpu.readout.streaming_fit import (
    finalize_ridge,
    init_ridge_accum,
    update_ridge_accum,
)


def _stream_fit(x, y, k, batch: int, alpha: float = 1.0):
    """Reference driver for the accumulator: batched updates incl. a
    padded final batch, shift from the first batch's mean."""
    state = None
    for s in range(0, x.shape[0], batch):
        xb = x[s:s + batch]
        yb = y[s:s + batch]
        n_real = xb.shape[0]
        if n_real < batch:
            xb = np.pad(xb, [(0, batch - n_real), (0, 0)])
            yb = np.pad(yb, [(0, batch - n_real)])
        w = np.zeros(batch, np.float32)
        w[:n_real] = 1.0
        fb = jnp.asarray(xb)
        if state is None:
            wd = jnp.asarray(w)
            shift = jnp.sum(fb * wd[:, None], axis=0) / jnp.sum(wd)
            state = init_ridge_accum(shift, k)
        state = update_ridge_accum(state, fb, jnp.asarray(yb), jnp.asarray(w))
    return finalize_ridge(state, alpha=alpha)


def test_accumulator_matches_in_memory_ridge(rng):
    n, d, k = 230, 40, 5
    # Large feature means exercise the shifted-Gram cancellation guard.
    x = (rng.standard_normal((n, d)) * 3.0 + rng.uniform(-50, 50, d)).astype(
        np.float32
    )
    y = rng.integers(0, k, n).astype(np.int32)

    params, st = _stream_fit(x, y, k, batch=64)

    st_ref = scaler_mod.fit_scaler(jnp.asarray(x))
    z = scaler_mod.transform(st_ref, jnp.asarray(x))
    ref = logistic.fit_ridge(z, jnp.asarray(y), num_classes=k, alpha=1.0)

    np.testing.assert_allclose(st.mean, st_ref.mean, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(st.scale, st_ref.scale, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(params.w, ref.w, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(params.b, ref.b, rtol=5e-3, atol=5e-4)
    # Decision-level equivalence on fresh points.
    xq = (rng.standard_normal((64, d)) * 3.0).astype(np.float32) + x[:64]
    zq = scaler_mod.transform(st_ref, jnp.asarray(xq))
    assert (
        np.asarray(logistic.predict(params, zq))
        == np.asarray(logistic.predict(ref, zq))
    ).mean() > 0.95


def test_accumulator_batch_size_invariance(rng):
    n, d, k = 150, 16, 3
    x = (rng.standard_normal((n, d)) + 10.0).astype(np.float32)
    y = rng.integers(0, k, n).astype(np.int32)
    p1, s1 = _stream_fit(x, y, k, batch=150)
    p2, s2 = _stream_fit(x, y, k, batch=32)
    np.testing.assert_allclose(p1.w, p2.w, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(s1.mean, s2.mean, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        frontend=FrontendConfig(n_filters=32),
        commands=("a", "b", "c"),
        batch_size=16,
    )


@pytest.fixture(scope="module")
def sharded_corpus(cfg, tmp_path_factory):
    """Sharded spike dataset + the same data as one in-memory artifact."""
    audio, labels = dataset.synthetic_audio_batch(
        n_per_class=20, n_classes=len(cfg.commands), seed=7
    )
    spikes = pipeline.featurize_audio_array(cfg, audio, mesh=None)
    root = tmp_path_factory.mktemp("streamfit") / "ds"
    w = ShardedSpikeDatasetWriter(Path(root), shard_size=13)
    w.append(spikes, labels, np.arange(len(labels)))
    w.close()
    return ShardedSpikeDataset(Path(root)), SpikeDataset(spikes, labels)


def test_mmap_shard_reader_matches_npload(tmp_path, rng):
    """Uncompressed shards read via the zero-copy zip memmap
    (io/sharded._mmap_npz_member) must be byte-identical to np.load on
    every member; compressed shards fall back to np.load."""
    from lsm_tpu.io.sharded import _mmap_npz_member

    x = (rng.random((37, 8, 40)) < 0.1).astype(np.uint8)
    y = rng.integers(0, 5, 37).astype(np.int32)
    for compress, expect_mmap in ((False, True), (True, False)):
        root = tmp_path / f"ds_{compress}"
        w = ShardedSpikeDatasetWriter(root, shard_size=16, compress=compress)
        w.append(x, y, np.arange(37))
        w.close()
        sds = ShardedSpikeDataset(root)
        off = 0
        for s in sds.manifest["shards"]:
            m = _mmap_npz_member(root / s["file"], "X_spikes")
            assert (m is not None) == expect_mmap, (compress, s["file"])
            shard = sds._load_shard(s)
            with np.load(root / s["file"]) as ref:
                np.testing.assert_array_equal(
                    np.asarray(shard.x_spikes), ref["X_spikes"]
                )
                np.testing.assert_array_equal(
                    np.asarray(shard.y_labels), ref["y_labels"]
                )
            off += s["num_samples"]
        idx = rng.permutation(37)[:11]
        np.testing.assert_array_equal(sds.gather_rows(idx), x[idx])
        np.testing.assert_array_equal(sds.labels(), y)


def test_masked_batches_cover_exactly_the_mask(sharded_corpus, rng):
    sds, dense = sharded_corpus
    mask = rng.random(dense.x_spikes.shape[0]) < 0.4
    xs, ys = [], []
    for xb, yb in pipeline._iter_masked_batches(sds, mask, 16):
        assert xb.shape[0] <= 16
        xs.append(xb)
        ys.append(yb)
    np.testing.assert_array_equal(
        np.concatenate(xs), dense.x_spikes[mask]
    )
    np.testing.assert_array_equal(np.concatenate(ys), dense.y_labels[mask])


def test_reader_labels_and_gather(sharded_corpus, rng):
    sds, dense = sharded_corpus
    np.testing.assert_array_equal(sds.labels(), dense.y_labels)
    idx = rng.permutation(dense.x_spikes.shape[0])[:17]
    np.testing.assert_array_equal(
        sds.gather_rows(idx), dense.x_spikes[idx]
    )
    with pytest.raises(IndexError):
        sds.gather_rows(np.array([dense.x_spikes.shape[0]]))


def test_streaming_pipeline_matches_in_memory(cfg, sharded_corpus):
    sds, dense = sharded_corpus

    res_stream = pipeline.extract_and_train_streaming(
        cfg, sds, run_diagnostics=False, mesh=None
    )

    # In-memory oracle: same stage 2, ridge readout on the scaled matrix.
    ext = pipeline.extract_lsm_features(
        cfg, dense, run_diagnostics=False, mesh=None
    )
    assert res_stream.mean_weight == pytest.approx(ext.mean_weight, rel=1e-6)
    np.testing.assert_allclose(
        res_stream.scaler.mean, ext.scaler.mean, rtol=1e-4, atol=1e-4
    )
    ref = logistic.fit_ridge(
        jnp.asarray(ext.artifact.x_train),
        jnp.asarray(ext.artifact.y_train),
        num_classes=len(cfg.commands),
        alpha=1.0,
    )
    ref_preds = np.asarray(
        logistic.predict(ref, jnp.asarray(ext.artifact.x_test))
    )
    ref_acc = float((ref_preds == ext.artifact.y_test).mean())
    assert res_stream.accuracy == pytest.approx(ref_acc, abs=1e-6)
    assert res_stream.n_train == len(ext.artifact.y_train)
    assert res_stream.n_test == len(ext.artifact.y_test)


def test_streaming_logistic_matches_in_memory_fit(cfg, sharded_corpus):
    """readout='logistic' (VERDICT r4 item 2): the streamed pass holds
    features in a device-resident buffer and runs the exact fit_logistic
    — the REFERENCE readout (train_classifier.py:36-41) at corpus scale.
    Oracle: fit_logistic on the in-memory scaled matrix, same split."""
    sds, dense = sharded_corpus

    res_stream = pipeline.extract_and_train_streaming(
        cfg, sds, run_diagnostics=False, mesh=None, readout="logistic",
    )

    ext = pipeline.extract_lsm_features(
        cfg, dense, run_diagnostics=False, mesh=None
    )
    ref, _ = logistic.fit_logistic(
        jnp.asarray(ext.artifact.x_train),
        jnp.asarray(ext.artifact.y_train),
        num_classes=len(cfg.commands),
    )
    x_test = jnp.asarray(ext.artifact.x_test)
    ref_preds = np.asarray(logistic.predict(ref, x_test))
    ref_acc = float((ref_preds == ext.artifact.y_test).mean())
    assert res_stream.accuracy == pytest.approx(ref_acc, abs=0.02)
    # Decision-level equivalence: the streamed readout (applied with its
    # own streamed scaler, which matches the two-pass one to ~1e-5) must
    # agree with the in-memory fit on the test rows.
    mine = np.asarray(logistic.predict(res_stream.readout, x_test))
    assert (mine == ref_preds).mean() >= 0.95
    np.testing.assert_allclose(
        res_stream.scaler.mean, ext.scaler.mean, rtol=1e-4, atol=1e-4
    )


def test_streaming_logistic_mesh_matches_single_device(cfg, sharded_corpus):
    sds, _ = sharded_corpus
    single = pipeline.extract_and_train_streaming(
        cfg, sds, run_diagnostics=False, mesh=None, readout="logistic",
    )
    meshed = pipeline.extract_and_train_streaming(
        cfg, sds, run_diagnostics=False, mesh="auto", readout="logistic",
    )
    assert meshed.accuracy == pytest.approx(single.accuracy, abs=1e-6)
    np.testing.assert_allclose(
        meshed.readout.w, single.readout.w, rtol=5e-2, atol=1e-3
    )


def test_streaming_fit_rejects_unknown_readout(cfg, sharded_corpus):
    sds, _ = sharded_corpus
    with pytest.raises(ValueError, match="ridge.*logistic"):
        pipeline.extract_and_train_streaming(
            cfg, sds, run_diagnostics=False, mesh=None, readout="sgd",
        )


def test_streaming_pipeline_mesh_matches_single_device(cfg, sharded_corpus):
    sds, _ = sharded_corpus
    single = pipeline.extract_and_train_streaming(
        cfg, sds, run_diagnostics=False, mesh=None
    )
    meshed = pipeline.extract_and_train_streaming(
        cfg, sds, run_diagnostics=False, mesh="auto"
    )
    assert meshed.accuracy == pytest.approx(single.accuracy, abs=1e-6)
    np.testing.assert_allclose(
        meshed.readout.w, single.readout.w, rtol=1e-3, atol=1e-4
    )


def test_streaming_fit_rejects_label_vocab_mismatch(cfg, sharded_corpus):
    """Out-of-range labels must raise, not silently corrupt the ridge
    statistics (one_hot zeroes them: counted in the Gram, absent from
    X^T Y)."""
    sds, _ = sharded_corpus
    with pytest.raises(ValueError, match="class vocabulary"):
        pipeline.extract_and_train_streaming(
            cfg, sds, run_diagnostics=False, mesh=None,
            class_names=("a", "b"),  # corpus has 3 classes
        )
