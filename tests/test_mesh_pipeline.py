"""The production pipeline on a mesh == the single-device pipeline.

VERDICT round-1 acceptance: `main.py --synthetic` on the 8-device CPU mesh
must produce identical spike artifacts and accuracy to the single-device
run (feature floats may differ in reduction order only). The mesh path is
the SURVEY 2.4a replacement for the reference's serial loop
(extract_lsm_features.py:78).
"""

import jax
import numpy as np
import pytest

from lsm_tpu.config import (
    FrontendConfig,
    PipelineConfig,
    ReservoirConfig,
)
from lsm_tpu.io import artifacts, dataset
from lsm_tpu.parallel.mesh import auto_mesh
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


@pytest.fixture(scope="module")
def corpus(cfg):
    audio, labels = dataset.synthetic_audio_batch(
        n_per_class=20, n_classes=len(cfg.commands), seed=7
    )
    return audio, labels


def test_mesh_pipeline_matches_single_device(cfg, corpus):
    audio, labels = corpus
    mesh = auto_mesh()
    assert mesh is not None and jax.device_count() == 8

    # Stage 1: spikes must be byte-identical (uint8, per-sample compute).
    spikes_1 = pipeline.featurize_audio_array(cfg, audio, mesh=None)
    spikes_m = pipeline.featurize_audio_array(cfg, audio, mesh=mesh)
    np.testing.assert_array_equal(spikes_1, spikes_m)

    ds = artifacts.SpikeDataset(x_spikes=spikes_1, y_labels=labels)

    # Stage 2: same calibration scalar; features equal up to reduction
    # order in the scaler moments.
    ext_1 = pipeline.extract_lsm_features(cfg, ds, mesh=None,
                                          run_diagnostics=False)
    ext_m = pipeline.extract_lsm_features(cfg, ds, mesh=mesh,
                                          run_diagnostics=False)
    assert ext_1.mean_weight == pytest.approx(ext_m.mean_weight, rel=1e-6)
    np.testing.assert_allclose(
        ext_m.artifact.x_train, ext_1.artifact.x_train, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        ext_m.artifact.x_test, ext_1.artifact.x_test, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(ext_m.artifact.y_train, ext_1.artifact.y_train)
    np.testing.assert_array_equal(ext_m.artifact.y_test, ext_1.artifact.y_test)

    # Stage 3: same accuracy, same predictions-on-test behavior.
    res_1 = pipeline.train_and_evaluate(cfg, ext_1.artifact, mesh=None)
    res_m = pipeline.train_and_evaluate(cfg, ext_1.artifact, mesh=mesh)
    assert res_1.accuracy == pytest.approx(res_m.accuracy, abs=1e-9)


def test_mesh_test_split_not_divisible(cfg, corpus):
    """The padded-prediction path: 4-class x 20 gives a 16-sample test
    split (divisible); force an odd split via test_size."""
    audio, labels = corpus
    import dataclasses as dc

    cfg_odd = dc.replace(cfg, test_size=0.27)
    spikes = pipeline.featurize_audio_array(cfg_odd, audio, mesh=None)
    ds = artifacts.SpikeDataset(x_spikes=spikes, y_labels=labels)
    ext = pipeline.extract_lsm_features(cfg_odd, ds, mesh=None,
                                        run_diagnostics=False)
    assert ext.artifact.x_test.shape[0] % 8 != 0
    res_m = pipeline.train_and_evaluate(cfg_odd, ext.artifact, mesh=auto_mesh())
    res_1 = pipeline.train_and_evaluate(cfg_odd, ext.artifact, mesh=None)
    assert res_m.accuracy == pytest.approx(res_1.accuracy, abs=1e-9)
