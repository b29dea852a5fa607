"""Device-side reservoir init preserves the topology/weight contract.

Large reservoirs draw on device (jax.random) instead of host NumPy
(reservoir.py:_DEVICE_INIT_THRESHOLD) — the draws differ (the contract is
statistical, SURVEY.md 2.3) but the directed-WS topology invariants and
weight distribution must match the host path exactly in structure.
"""

import numpy as np

from lsm_tpu.config import ReservoirConfig
from lsm_tpu.models import reservoir as res


def _structure(params, n, c):
    w = np.asarray(params.w_rec)[:n, :n]
    nz = w != 0
    return {
        "outdeg": nz.sum(axis=1),
        "selfloops": int(np.trace(nz)),
        "w_mean": float(w[nz].mean()),
        "w_std": float(w[nz].std()),
        "in_per_ch": np.count_nonzero(np.asarray(params.w_in)[:c], axis=1),
        "pad_zero": float(np.abs(np.asarray(params.w_rec)[n:]).sum()
                          + np.abs(np.asarray(params.w_rec)[:, n:]).sum()),
    }


def test_device_init_matches_host_structure():
    n, c = 1024, 32
    cfg = ReservoirConfig(
        num_neurons=n, num_output_neurons=256, small_world_k=204,
        mean_weight=0.01,
    )
    host = _structure(res.init_reservoir(cfg, c, device_init=False), n, c)
    dev = _structure(res.init_reservoir(cfg, c, device_init=True), n, c)

    half = 204 // 2
    for s in (host, dev):
        # Directed WS: out-degree k/2 (minus rare collisions), no
        # self-loops, zero padding rows/cols, exact input fanout.
        assert s["selfloops"] == 0
        assert s["pad_zero"] == 0.0
        assert half - 6 <= s["outdeg"].min() <= s["outdeg"].max() <= half
        assert (s["in_per_ch"] == cfg.input_fanout).all()
    # Same weight distribution: mean ~ mean_weight, std ~ |mw|*sqrt(var).
    target_std = 0.01 * np.sqrt(cfg.weight_variance)
    for s in (host, dev):
        assert abs(s["w_mean"] - 0.01) < 5e-4
        assert abs(s["w_std"] - target_std) < 2e-3


def test_auto_threshold_routes():
    small = ReservoirConfig(num_neurons=256, num_output_neurons=64,
                            small_world_k=32, mean_weight=0.02)
    # Host path is deterministic in the seed: two calls bit-identical.
    a = res.init_reservoir(small, 16)
    b = res.init_reservoir(small, 16)
    np.testing.assert_array_equal(np.asarray(a.w_rec), np.asarray(b.w_rec))
    # Device path is deterministic too (jax.random with fixed seed).
    c1 = res.init_reservoir(small, 16, device_init=True)
    c2 = res.init_reservoir(small, 16, device_init=True)
    np.testing.assert_array_equal(np.asarray(c1.w_rec), np.asarray(c2.w_rec))
