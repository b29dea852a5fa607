"""Reservoir health diagnostics (edge-of-chaos regime check).

TPU-native equivalent of `run_network_diagnostics`
(extract_lsm_features.py:92-152): run a few samples, measure per-neuron
participation across the FULL reservoir, classify the dynamical regime, and
emit tuning advice. Unlike the reference (which reads the dense Time x
Neurons `spike_matrix`), we consume the streaming per-neuron spike counts
produced by `simulate_batch`, so no raster is materialized.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from lsm_tpu.models.reservoir import ReservoirParams, simulate_batch

SUB_CRITICAL = "SUB-CRITICAL"
SUPER_CRITICAL = "SUPER-CRITICAL"
EDGE_OF_CHAOS = "EDGE OF CHAOS"


@dataclasses.dataclass
class DiagnosticsReport:
    participation: List[float]       # percent of neurons firing >= 1, per sample
    dead_neurons: List[int]
    avg_spikes_per_neuron: List[float]
    avg_participation: float
    regime: str
    advice: str

    def render(self) -> str:
        lines = ["=" * 40, "RUNNING NETWORK DIAGNOSTICS", "=" * 40]
        for i, (p, d, a) in enumerate(
            zip(self.participation, self.dead_neurons, self.avg_spikes_per_neuron)
        ):
            lines.append(
                f"Sample {i + 1}: Active: {p:.1f}% | Dead: {d} | "
                f"Avg Spikes/Neuron: {a:.2f}"
            )
        lines += [
            "-" * 40,
            "DIAGNOSTIC RESULT:",
            f"   Average Participation: {self.avg_participation:.1f}%",
            f"   STATUS: {self.regime}",
            f"   {self.advice}",
            "=" * 40,
        ]
        return "\n".join(lines)


def run_network_diagnostics(
    params: ReservoirParams, spikes: np.ndarray, n_samples: int = 5
) -> DiagnosticsReport:
    """Classify the reservoir regime from the first n_samples spike trains.

    Thresholds match extract_lsm_features.py:144-151: <40% participation is
    sub-critical, >98% super-critical, else edge of chaos.
    """
    import jax.numpy as jnp

    batch = jnp.asarray(spikes[:n_samples])
    if isinstance(params, ReservoirParams):
        stats = simulate_batch(params, batch)
    else:                                             # block-sparse reservoir
        from lsm_tpu.models.sparse import simulate_batch_sparse

        stats = simulate_batch_sparse(params, batch)
    counts = np.asarray(stats["all_counts"])          # (n, N)
    total = params.n_neurons

    participation = []
    dead = []
    avg_rate = []
    for row in counts:
        active = int(np.count_nonzero(row))
        participation.append(active / total * 100.0)
        dead.append(total - active)
        avg_rate.append(float(row.mean()))

    avg_part = float(np.mean(participation))
    if avg_part < 40.0:
        regime = SUB_CRITICAL
        advice = "Recommendation: INCREASE multiplier or DECREASE threshold."
    elif avg_part > 98.0:
        regime = SUPER_CRITICAL
        advice = "Recommendation: DECREASE multiplier."
    else:
        regime = EDGE_OF_CHAOS
        advice = "(Ideal is 80-95% participation with low firing rates)"

    return DiagnosticsReport(
        participation=participation,
        dead_neurons=dead,
        avg_spikes_per_neuron=avg_rate,
        avg_participation=avg_part,
        regime=regime,
        advice=advice,
    )
