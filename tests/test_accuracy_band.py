"""The accuracy oracle: a frozen benchmark the pipeline must score
mid-band on (VERDICT round-1 item 2).

Round 1's synthetic task saturated at accuracy 1.0, so no semantic
regression in the reservoir/feature code could ever fail a test. This
benchmark (lsm_tpu.io.dataset.synthetic_audio_batch_hard) is built so that

  - classes come in pairs sharing the SAME spectral profile; only temporal
    cues (onset / mid-gap / duration) separate a pair, so the reservoir's
    temporal feature semantics are load-bearing;
  - each cue is drawn from overlapping Gaussians -> an intrinsic Bayes
    error no model can saturate past (the task CANNOT hit 1.0);
  - the reference-default flagship config lands mid-band (0.8333 at this
    size on CPU; 0.775 'original' / 0.817 'all' at n=1200 on TPU — see
    docs/SENSITIVITY.md, where the default is the argmax of the whole
    perturbation table).

The oracle has two prongs: the accuracy band AND the diagnostics regime
(the reference's own health check, extract_lsm_features.py:144-151). The
companion power test shows a broken input-projection inference
(input_fanout=2) falls below the band and flips the regime — i.e. this
test can actually fail.
"""

import dataclasses

import numpy as np
import pytest

from lsm_tpu.config import PipelineConfig, ReservoirConfig
from lsm_tpu.io import dataset
from lsm_tpu import pipeline

# Frozen benchmark definition — do not change without recalibrating
# (tools/sensitivity.py) and updating docs/SENSITIVITY.md.
N_PER_CLASS = 30
N_CLASSES = 12
SEED = 42
ACC_BAND = (0.76, 0.90)     # CPU defaults measured 0.8333 (2026-08-16)


@pytest.fixture(scope="module")
def corpus():
    return dataset.synthetic_audio_batch_hard(
        n_per_class=N_PER_CLASS, n_classes=N_CLASSES, seed=SEED
    )


def test_reference_config_lands_in_band(corpus):
    audio, labels = corpus
    cfg = PipelineConfig(batch_size=64)
    res, ext = pipeline.run_pipeline_arrays(cfg, audio, labels, mesh=None)
    assert ext.diagnostics.regime == "EDGE OF CHAOS", ext.diagnostics.regime
    assert ACC_BAND[0] <= res.accuracy <= ACC_BAND[1], (
        f"accuracy {res.accuracy:.4f} outside frozen band {ACC_BAND} — "
        "either a semantic regression in the reservoir/feature path or an "
        "uncalibrated benchmark change"
    )


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 1234])
def test_band_holds_across_reservoir_seeds(corpus, seed):
    """The band is a STATISTICAL contract (SURVEY.md 2.3), not a property
    of one RNG draw: different reservoir seeds (different topology + weight
    draws, same distribution) must land in the same band with the same
    regime. Measured 2026-08-17: seed 42 -> 0.8333, 7 -> 0.8056,
    1234 -> 0.7778, 2026 -> 0.8194 (cross-seed spread ~0.06, well inside
    the band width 0.14)."""
    audio, labels = corpus
    cfg = dataclasses.replace(
        PipelineConfig(batch_size=64), reservoir=ReservoirConfig(seed=seed)
    )
    res, ext = pipeline.run_pipeline_arrays(cfg, audio, labels, mesh=None)
    assert ext.diagnostics.regime == "EDGE OF CHAOS", ext.diagnostics.regime
    assert ACC_BAND[0] <= res.accuracy <= ACC_BAND[1], (
        f"seed {seed} scored {res.accuracy:.4f}, outside {ACC_BAND} — the "
        "defaults are calibrated to an RNG draw, not to semantics"
    )


def test_oracle_has_power_against_broken_semantics(corpus):
    """A broken inference choice (input fanout 2 instead of the calibrated
    8 — the projection semantics SURVEY.md 2.3 marks [inferred]) must fall
    OUT of the band and flip the regime check."""
    audio, labels = corpus
    cfg = dataclasses.replace(
        PipelineConfig(batch_size=64),
        reservoir=ReservoirConfig(input_fanout=2),
    )
    res, ext = pipeline.run_pipeline_arrays(cfg, audio, labels, mesh=None)
    assert ext.diagnostics.regime != "EDGE OF CHAOS"
    assert res.accuracy < ACC_BAND[0], (
        f"broken-projection config scored {res.accuracy:.4f}, inside the "
        "band — the oracle has no power"
    )


def test_band_task_is_not_saturable(corpus):
    """The within-pair cues have an intrinsic Bayes floor: no config in the
    sensitivity sweep may reach 1.0 (a saturated oracle has zero power —
    the round-1 failure mode this benchmark replaces)."""
    audio, labels = corpus
    cfg = PipelineConfig(batch_size=64)
    res, _ = pipeline.run_pipeline_arrays(cfg, audio, labels, mesh=None)
    assert res.accuracy < 0.95
