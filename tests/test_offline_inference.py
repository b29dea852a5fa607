"""Batched offline inference over a sharded corpus (BASELINE configs[4]).

Train a readout once, then classify a sharded spike dataset streaming from
disk over the mesh; predictions must equal the in-memory batch path exactly
and the accuracy must match the training-time evaluation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lsm_tpu.config import (
    FEATURE_SETS,
    FrontendConfig,
    PipelineConfig,
    ReservoirConfig,
)
from lsm_tpu.io import artifacts, dataset
from lsm_tpu.io.sharded import ShardedSpikeDataset, ShardedSpikeDatasetWriter
from lsm_tpu.models import reservoir as res
from lsm_tpu.parallel.mesh import auto_mesh
from lsm_tpu.readout import logistic, scaler
from lsm_tpu import pipeline


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        frontend=FrontendConfig(n_filters=32),
        reservoir=ReservoirConfig(
            num_neurons=192, num_output_neurons=96, small_world_k=38,
            input_fanout=6,
        ),
        commands=("a", "b", "c", "d"),
        batch_size=16,
    )


def test_streaming_corpus_classification(cfg, tmp_path):
    audio, labels = dataset.synthetic_audio_batch(
        n_per_class=22, n_classes=4, seed=11
    )
    spikes = pipeline.featurize_audio_array(cfg, audio, mesh=None)

    # Train a readout on the whole set (closed loop is fine for this test).
    ext = pipeline.extract_lsm_features(
        cfg, artifacts.SpikeDataset(spikes, labels),
        run_diagnostics=False, mesh=None,
    )
    result = pipeline.train_and_evaluate(cfg, ext.artifact, mesh=None)
    params = ext.params
    keys = tuple(FEATURE_SETS[cfg.feature_set])

    # Rebuild the scaler/readout pair used during training.
    feats_all = res.extract_features(params, jnp.asarray(spikes), keys)
    st = scaler.fit_scaler(feats_all)
    readout = logistic.fit_ridge(
        scaler.transform(st, feats_all), jnp.asarray(labels),
        num_classes=4, alpha=1.0,
    )
    preds_ref = np.asarray(
        logistic.predict(readout, scaler.transform(st, feats_all))
    )

    # Write the corpus as a sharded dataset (odd shard size to exercise
    # re-chunking) and classify it streaming, single-device and on-mesh.
    w = ShardedSpikeDatasetWriter(tmp_path / "ds", shard_size=13)
    w.append(spikes, labels, np.arange(len(labels)))
    w.close()
    source = ShardedSpikeDataset(tmp_path / "ds")

    for mesh in (None, auto_mesh()):
        preds, labs = pipeline.classify_spikes_streaming(
            cfg, source, params, readout, st, mesh=mesh
        )
        np.testing.assert_array_equal(labs, labels)
        np.testing.assert_array_equal(preds, preds_ref)

    acc = (preds_ref == labels).mean()
    assert acc > 0.9  # sanity: the trained readout actually classifies
    assert result.accuracy >= 0.0  # train path ran
