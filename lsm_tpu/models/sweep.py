"""Hyperparameter sweep utilities for reservoir regime calibration.

The reference's snnpy internals (input projection scheme, weight_variance
semantics) are not on disk, so SURVEY.md section 7 mandates calibrating our
parameterization empirically: the acceptance criteria are the diagnostics
regime (80-95% participation, low rates at multiplier 0.6) and end-to-end
accuracy. This module sweeps (input_fanout, input_weight, weight_variance, multiplier)
and reports the regime per point; `tools/calibrate.py` drives it.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import List, Sequence

import numpy as np

from lsm_tpu.config import ReservoirConfig
from lsm_tpu.models import reservoir as res
from lsm_tpu.models.calibration import calibrate_weight


@dataclasses.dataclass
class SweepPoint:
    input_fanout: int
    input_weight: float
    weight_variance: float
    multiplier: float
    participation: float      # %
    spikes_per_neuron: float
    regime: str


def sweep_regime(
    spikes: np.ndarray,
    base_cfg: ReservoirConfig,
    input_fanouts: Sequence[int],
    input_weights: Sequence[float],
    weight_variances: Sequence[float],
    multipliers: Sequence[float] = (0.6,),
    n_probe: int = 8,
) -> List[SweepPoint]:
    import sys

    import jax.numpy as jnp

    from lsm_tpu.models.reservoir import simulate_batch

    probe = jnp.asarray(spikes[:n_probe])
    n_channels = spikes.shape[1]
    out: List[SweepPoint] = []
    for fo, wi, wv, mult in itertools.product(
        input_fanouts, input_weights, weight_variances, multipliers
    ):
        print(f"... sweeping fanout={fo} w_in={wi} wv={wv} mult={mult}",
              file=sys.stderr, flush=True)
        cfg = dataclasses.replace(
            base_cfg, input_fanout=fo, input_weight=wi, weight_variance=wv
        )
        _, mw = calibrate_weight(cfg, jnp.asarray(spikes), mult)
        if cfg.use_sparse():
            from lsm_tpu.models.sparse import (
                init_reservoir_sparse,
                simulate_batch_sparse,
            )

            params = init_reservoir_sparse(cfg, n_channels, mean_weight=mw)
            stats = simulate_batch_sparse(params, probe)
        else:
            params = res.init_reservoir(cfg, n_channels, mean_weight=mw)
            stats = simulate_batch(params, probe)
        counts = np.asarray(stats["all_counts"])
        part = float((counts > 0).mean(axis=1).mean() * 100.0)
        rate = float(counts.mean())
        regime = (
            "SUB-CRITICAL" if part < 40 else
            "SUPER-CRITICAL" if part > 98 else "EDGE OF CHAOS"
        )
        out.append(SweepPoint(fo, wi, wv, mult, part, rate, regime))
    return out
