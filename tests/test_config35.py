"""BASELINE.json configs[2]: full 35-class vocabulary with a 256-filter
gammatone frontend (reference flag surface: main.py:35-44 / --n-filters,
--vocab v35 extension). Scaled-down reservoir — the contract under test is
the 35-class label path end-to-end, the 256-channel padding/fanout through
the reservoir input projection, and the per-class report rendering."""

import numpy as np
import pytest

from lsm_tpu.config import (
    COMMANDS_35,
    FrontendConfig,
    PipelineConfig,
    ReservoirConfig,
)
from lsm_tpu.io import dataset
from lsm_tpu.pipeline import run_pipeline_arrays


@pytest.mark.slow
def test_35class_256filter_end_to_end():
    assert len(COMMANDS_35) == 35
    cfg = PipelineConfig(
        frontend=FrontendConfig(n_filters=256, filterbank="gammatone",
                                gammatone_method="iir"),
        reservoir=ReservoirConfig(
            num_neurons=512, num_output_neurons=256, small_world_k=102,
            input_fanout=6,
        ),
        feature_set="original",
        commands=COMMANDS_35,
        batch_size=64,
        test_size=0.2,
    )
    audio, labels = dataset.synthetic_audio_batch(
        n_per_class=10, n_classes=35, seed=77
    )
    result, ext = run_pipeline_arrays(cfg, audio, labels)

    # 256 channels pad to 256 (already a lane multiple) and fan out into
    # the 512-neuron reservoir; features are 5 keys x 256 output neurons.
    assert ext.artifact.x_train.shape[1] == 5 * 256
    assert ext.params.w_in.shape[0] == 256

    # 35 distinct synthetic classes, chance = 2.9%: a healthy pipeline must
    # be far above chance even with the scaled-down reservoir.
    assert result.accuracy > 0.25, f"accuracy too low: {result.accuracy}"

    # The classification report renders all 35 class rows by name
    # (train_classifier.py:48 parity at the extended vocabulary).
    rendered = result.report.render()
    for name in COMMANDS_35:
        assert name in rendered
    assert len(result.report.class_names) == 35
    assert result.report.support.sum() == len(labels) * cfg.test_size
