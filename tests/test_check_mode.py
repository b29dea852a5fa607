"""--check sanitizer mode (SURVEY.md section 5.2, utils/checks.py wiring):
NaN-injected inputs and dead-reservoir outputs must fail LOUDLY instead of
being papered over (the reference hides NaNs behind np.nan_to_num,
extract_lsm_features.py:85)."""

import dataclasses

import numpy as np
import pytest

from lsm_tpu import pipeline
from lsm_tpu.config import FrontendConfig, PipelineConfig, ReservoirConfig
from lsm_tpu.io import artifacts


def _tiny_cfg(check=True):
    return PipelineConfig(
        frontend=FrontendConfig(n_filters=16, filterbank="mel"),
        reservoir=ReservoirConfig(
            num_neurons=128, num_output_neurons=64, small_world_k=16
        ),
        commands=("a", "b"),
        batch_size=8,
        check=check,
    )


def test_check_rejects_nan_audio(rng):
    cfg = _tiny_cfg()
    audio = rng.standard_normal((8, 16000)).astype(np.float32) * 0.2
    audio[3, 1000] = np.nan
    with pytest.raises(Exception, match="(?i)nan"):
        pipeline.featurize_audio_array(cfg, audio, mesh=None)
    # The unchecked path silently encodes it (the failure mode --check exists
    # to catch): same input, no error.
    unchecked = dataclasses.replace(cfg, check=False)
    spikes = pipeline.featurize_audio_array(unchecked, audio, mesh=None)
    assert spikes.shape[0] == 8


def test_check_accepts_clean_audio(rng):
    cfg = _tiny_cfg()
    audio = rng.standard_normal((8, 16000)).astype(np.float32) * 0.2
    spikes = pipeline.featurize_audio_array(cfg, audio, mesh=None)
    assert set(np.unique(spikes)) <= {0, 1}


def test_check_flags_dead_reservoir(rng):
    """All-zero spike trains drive nothing: every feature is constant and
    the --check output validation must fail with a clear message."""
    cfg = _tiny_cfg()
    ds = artifacts.SpikeDataset(
        x_spikes=np.zeros((40, 16, 400), np.uint8),
        y_labels=np.tile(np.arange(2, dtype=np.int32), 20),
    )
    with pytest.raises(RuntimeError, match="--check failed.*constant"):
        pipeline.extract_lsm_features(cfg, ds, run_diagnostics=False, mesh=None)


def test_check_passes_live_reservoir(rng):
    """A live input must sail through the checked extraction unchanged."""
    cfg = _tiny_cfg()
    ds = artifacts.SpikeDataset(
        x_spikes=(rng.random((40, 16, 400)) < 0.1).astype(np.uint8),
        y_labels=np.tile(np.arange(2, dtype=np.int32), 20),
    )
    res_checked = pipeline.extract_lsm_features(
        cfg, ds, run_diagnostics=False, mesh=None
    )
    res_plain = pipeline.extract_lsm_features(
        dataclasses.replace(cfg, check=False), ds,
        run_diagnostics=False, mesh=None,
    )
    np.testing.assert_allclose(
        res_checked.artifact.x_train, res_plain.artifact.x_train,
        rtol=1e-5, atol=1e-5,
    )


def test_check_flag_reaches_config():
    import argparse

    from lsm_tpu.cli.common import add_extension_flags, build_config

    p = argparse.ArgumentParser()
    add_extension_flags(p)
    args = p.parse_args(["--check"])
    assert build_config(args).check is True
    args = p.parse_args([])
    assert build_config(args).check is False


def test_check_rejects_nan_audio_on_mesh(rng):
    """The mesh path cannot run checkify (shard_map), so --check guards
    the input with a device-side finiteness reduction — NaN audio must
    still fail loudly under a mesh."""
    cfg = _tiny_cfg()
    audio = rng.standard_normal((8, 16000)).astype(np.float32) * 0.2
    audio[3, 1000] = np.nan
    with pytest.raises(RuntimeError, match="non-finite audio"):
        pipeline.featurize_audio_array(cfg, audio, mesh="auto")
    # Clean audio passes, and matches the single-device featurization.
    audio[3, 1000] = 0.0
    meshed = pipeline.featurize_audio_array(cfg, audio, mesh="auto")
    single = pipeline.featurize_audio_array(cfg, audio, mesh=None)
    np.testing.assert_array_equal(np.asarray(meshed), np.asarray(single))
