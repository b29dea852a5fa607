#!/usr/bin/env python
"""Sweep reservoir parameterization to find edge-of-chaos defaults.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/calibrate.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from lsm_tpu.config import FrontendConfig, ReservoirConfig
from lsm_tpu.io.dataset import synthetic_audio_batch
from lsm_tpu.models.frontend import featurize_batch
from lsm_tpu.models.sweep import sweep_regime


def main():
    import jax.numpy as jnp

    audio, _ = synthetic_audio_batch(n_per_class=8, n_classes=12, seed=42)
    fcfg = FrontendConfig()
    spikes = np.asarray(featurize_batch(jnp.asarray(audio), fcfg))
    print(f"probe spikes: {spikes.shape} density={spikes.mean():.4f}")

    points = sweep_regime(
        spikes,
        ReservoirConfig(),
        input_densities=[0.05, 0.1, 0.2, 0.3],
        input_gains=[0.25, 0.5, 1.0, 2.0],
        weight_variances=[1.0, 4.0, 10.0],
        multiplier=0.6,
    )
    print(f"{'dens':>6} {'gain':>6} {'wvar':>6} {'part%':>7} {'spk/n':>8} regime")
    for p in sorted(points, key=lambda p: abs(p.participation - 88)):
        print(f"{p.input_density:6.2f} {p.input_gain:6.2f} {p.weight_variance:6.1f} "
              f"{p.participation:7.1f} {p.spikes_per_neuron:8.2f} {p.regime}")


if __name__ == "__main__":
    main()
