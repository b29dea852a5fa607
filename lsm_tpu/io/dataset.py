"""Dataset discovery and synthetic data generation.

Mirrors the reference's dataset builder behavior (create_dataset.py:107-166):
hard class list, per-class sorted `*.wav` glob capped at
MAX_SAMPLES_PER_CLASS, missing-directory / empty-glob warnings with skip,
and a hard error when nothing was processed.

Also provides a deterministic synthetic spoken-word generator (formant-like
tone bundles with per-class signatures) used by tests and benchmarks when the
real Speech Commands corpus is not on disk.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class DatasetIndex:
    files: List[Path]
    labels: np.ndarray            # (N,) int32
    class_names: Sequence[str]
    warnings: List[str]


def index_speech_commands(
    base_path: Path,
    commands: Sequence[str],
    max_samples_per_class: int = 1000,
) -> DatasetIndex:
    """Walk <base>/<command>/*.wav exactly like create_dataset.py:130-141."""
    base_path = Path(base_path)
    files: List[Path] = []
    labels: List[int] = []
    warnings: List[str] = []
    for label_idx, command in enumerate(commands):
        command_dir = base_path / command
        if not command_dir.is_dir():
            warnings.append(f"Directory not found, skipping: {command_dir}")
            continue
        wavs = sorted(command_dir.glob("*.wav"))[:max_samples_per_class]
        if not wavs:
            warnings.append(f"No files found for '{command}'")
            continue
        files.extend(wavs)
        labels.extend([label_idx] * len(wavs))
    return DatasetIndex(
        files=files,
        labels=np.asarray(labels, np.int32),
        class_names=commands,
        warnings=warnings,
    )


# ---------------------------------------------------------------------------
# Synthetic spoken-word corpus (tests/bench stand-in for Speech Commands).
# ---------------------------------------------------------------------------

def synthetic_word(
    class_idx: int,
    rng: np.random.Generator,
    sample_rate: int = 16000,
    duration: float = 1.0,
) -> np.ndarray:
    """One synthetic 'utterance' with a class-specific spectro-temporal shape.

    Each class gets a distinct bundle of formant-like tones with
    class-dependent onset, chirp rate, and amplitude modulation, plus noise
    and random gain/jitter so the task is nontrivial but learnable.
    """
    n = int(sample_rate * duration)
    t = np.arange(n) / sample_rate
    base = 220.0 * (1.18 ** (class_idx % 12))
    chirp = (-1) ** class_idx * (30.0 + 12.0 * (class_idx % 5))
    onset = 0.08 + 0.02 * (class_idx % 7) + rng.uniform(-0.02, 0.02)
    dur = 0.45 + 0.04 * (class_idx % 4) + rng.uniform(-0.05, 0.05)
    am = 3.0 + (class_idx % 6)

    env = np.clip((t - onset) / 0.03, 0, 1) * np.clip((onset + dur - t) / 0.1, 0, 1)
    env = np.clip(env, 0, 1) * (0.6 + 0.4 * np.cos(2 * np.pi * am * (t - onset)) ** 2)
    jitter = rng.uniform(0.97, 1.03)
    sig = np.zeros(n)
    for h, w in ((1.0, 1.0), (2.1, 0.5), (3.3, 0.3)):
        f = base * h * jitter + chirp * t * h
        sig += w * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    sig *= env
    sig += 0.02 * rng.standard_normal(n)
    peak = np.abs(sig).max() + 1e-9
    return (0.5 * sig / peak * rng.uniform(0.7, 1.0)).astype(np.float32)


def synthetic_audio_batch(
    n_per_class: int,
    n_classes: int,
    seed: int = 42,
    sample_rate: int = 16000,
    duration: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(N, T) float32 audio + (N,) int32 labels, class-interleaved."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for c in range(n_classes):
        for _ in range(n_per_class):
            xs.append(synthetic_word(c, rng, sample_rate, duration))
            ys.append(c)
    return np.stack(xs), np.asarray(ys, np.int32)


def synthetic_word_hard(
    class_idx: int,
    rng: np.random.Generator,
    sample_rate: int = 16000,
    duration: float = 1.0,
    snr_db_range: Tuple[float, float] = (3.0, 12.0),
) -> np.ndarray:
    """One utterance of the HARD benchmark (the accuracy oracle's task).

    Classes come in confusable pairs: pair p = classes (2p, 2p+1) share the
    SAME formant stack (spectral profile), and differ only in temporal
    structure — amplitude-modulation rate and envelope direction. A readout
    on purely spectral features cannot separate a pair; separating them
    requires the reservoir's temporal statistics (spike timing / ISI /
    rate-variability), which is exactly the machinery whose [inferred]
    semantics the oracle must be sensitive to. Speaker-like jitter (base
    frequency, onset, duration) plus additive noise at a random SNR keep
    the task non-saturated for the reference-default config.
    """
    n = int(sample_rate * duration)
    t = np.arange(n) / sample_rate
    pair = class_idx // 2
    variant = class_idx % 2

    # Shared-within-pair spectral profile: a pure spectral readout cannot
    # separate a pair.
    base = 180.0 * (1.31 ** pair)
    harmonics = ((1.0, 1.0), (2.4, 0.55), (3.9, 0.35))

    # The pair-separating cue is TEMPORAL, drawn from overlapping Gaussians
    # so each pair has a tunable intrinsic (Bayes) error the model cannot
    # saturate past. Cue type cycles by pair, covering the different
    # temporal statistics the reservoir features encode:
    #   type 0 - onset time          (spike-time means / first-spike)
    #   type 1 - mid-utterance gap   (ISI moments, bursts)
    #   type 2 - duration            (counts, last-spike, rate windows)
    #   type 3 - modulation depth    (windowed-rate variance / ISI variance:
    #            equal mean energy, so counts and mean times carry nothing —
    #            only rate-VARIABILITY features separate these)
    # Everything else (pitch jitter, phase, AM rate, envelope direction) is
    # randomized per utterance and carries no label information.
    cue = pair % 4
    onset = rng.normal(0.14, 0.02)
    dur = rng.normal(0.55, 0.04)
    gap_len = 0.0
    mod_depth = float(np.clip(rng.normal(0.5, 0.25), 0.0, 1.0))
    if cue == 0:
        onset = rng.normal((0.14, 0.30)[variant], 0.055)
    elif cue == 1:
        gap_len = max(rng.normal((0.06, 0.17)[variant], 0.038), 0.0)
    elif cue == 2:
        dur = rng.normal((0.42, 0.60)[variant], 0.062)
    else:
        mod_depth = float(
            np.clip(rng.normal((0.15, 0.85)[variant], 0.22), 0.0, 1.0)
        )
    onset = float(np.clip(onset, 0.02, 0.45))
    dur = float(np.clip(dur, 0.2, 0.9))

    am = rng.uniform(2.0, 6.0)                         # random, not a cue
    ramp = np.clip((t - onset) / dur, 0, 1)
    env_dir = ramp if rng.random() < 0.5 else (1.0 - ramp)  # random, not a cue
    gate = np.clip((t - onset) / 0.02, 0, 1) * np.clip((onset + dur - t) / 0.05, 0, 1)
    # Depth-`mod_depth` square-ish AM with mean 1.0 regardless of depth
    # (mean energy does not depend on the depth cue).
    carrier = np.tanh(4.0 * np.cos(2 * np.pi * am * (t - onset)))
    env = np.clip(gate, 0, 1) * (0.35 + 0.65 * env_dir) * (
        1.0 + mod_depth * 0.95 * carrier
    )
    if gap_len > 0.0:
        gap_mid = onset + 0.5 * dur + rng.uniform(-0.03, 0.03)
        env = env * (1.0 - np.clip(1.0 - np.abs(t - gap_mid) / (0.5 * gap_len), 0, 1))

    jitter = rng.uniform(0.92, 1.08)                   # "speaker" variation
    sig = np.zeros(n)
    for h, w in harmonics:
        f = base * h * jitter
        sig += w * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    sig *= env

    sig_rms = np.sqrt(np.mean(sig**2)) + 1e-12
    snr_db = rng.uniform(*snr_db_range)
    noise_rms = sig_rms / (10 ** (snr_db / 20))
    sig = sig + noise_rms * rng.standard_normal(n)
    peak = np.abs(sig).max() + 1e-9
    return (0.5 * sig / peak * rng.uniform(0.7, 1.0)).astype(np.float32)


def synthetic_audio_batch_hard(
    n_per_class: int,
    n_classes: int = 12,
    seed: int = 42,
    sample_rate: int = 16000,
    duration: float = 1.0,
    snr_db_range: Tuple[float, float] = (3.0, 12.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """The frozen hard benchmark: (N, T) float32 audio + (N,) int32 labels."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for c in range(n_classes):
        for _ in range(n_per_class):
            xs.append(
                synthetic_word_hard(c, rng, sample_rate, duration, snr_db_range)
            )
            ys.append(c)
    return np.stack(xs), np.asarray(ys, np.int32)


def write_synthetic_corpus(
    base_path: Path,
    commands: Sequence[str],
    n_per_class: int,
    seed: int = 42,
    sample_rate: int = 16000,
) -> None:
    """Materialize a synthetic corpus in Speech Commands directory layout."""
    from lsm_tpu.io.wav import write_wav

    rng = np.random.default_rng(seed)
    base_path = Path(base_path)
    for c, command in enumerate(commands):
        d = base_path / command
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_per_class):
            write_wav(d / f"{i:05d}.wav", synthetic_word(c, rng, sample_rate), sample_rate)
