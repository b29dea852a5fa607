"""Sharded artifact storage for large corpora (SURVEY.md section 5.4).

The reference's single compressed .npz works to ~10^4 utterances; the
100k-utterance configuration (BASELINE.json configs[4]) needs artifacts that
can be written incrementally, read shard-by-shard (streaming into device
batches without materializing the corpus in host RAM), and resumed.

Format: a directory with `shard_{i:05d}.npz` files (each a standard
spike-dataset .npz with the reference's exact keys, so any shard is
individually loadable by the classic loader), a `journal.jsonl` appended
after EVERY shard flush, and a `manifest.json` written on close. Crash
recovery: the journal is the incremental manifest — an interrupted run
loses only its unflushed buffer; re-running with `resume=True` picks up
after the last journaled shard (each journal entry records the index of the
last input file its shard consumed) and recomputes nothing that was
already written.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from lsm_tpu.io.artifacts import SpikeDataset

_MANIFEST = "manifest.json"
_JOURNAL = "journal.jsonl"
_FORMAT = "lsm_tpu.sharded_spike_dataset.v1"


def _mmap_npz_member(path: Path, member: str) -> Optional[np.ndarray]:
    """Zero-copy np.memmap view of an UNCOMPRESSED .npz member, or None.

    An .npz is a zip of .npy files; for ZIP_STORED (compress=False)
    entries the embedded .npy bytes sit contiguously in the container,
    so the array can be memory-mapped at (local header + npy header)
    offset instead of copied + CRC-checked through ZipExtFile. Returns
    None — caller falls back to np.load — for compressed members,
    Fortran-order arrays, object dtypes, or unexpected container bytes.
    The view is read-only; consumers copy the rows they keep (mask
    selection / batch concatenation), so resident file pages stay clean
    and evictable (no RSS growth that the kernel cannot reclaim)."""
    import struct
    import zipfile

    try:
        with zipfile.ZipFile(path) as zf:
            try:
                info = zf.getinfo(member + ".npy")
            except KeyError:
                return None
            if info.compress_type != zipfile.ZIP_STORED:
                return None
            header_offset = info.header_offset
        with open(path, "rb") as f:
            f.seek(header_offset)
            hdr = f.read(30)
            if len(hdr) != 30 or hdr[:4] != b"PK\x03\x04":
                return None
            name_len, extra_len = struct.unpack("<HH", hdr[26:30])
            f.seek(header_offset + 30 + name_len + extra_len)
            version = np.lib.format.read_magic(f)
            if version == (1, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
            elif version == (2, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
            else:
                return None
            if fortran or dtype.hasobject:
                return None
            array_offset = f.tell()
        return np.memmap(path, dtype=dtype, mode="r", offset=array_offset,
                         shape=shape)
    except (OSError, ValueError, zipfile.BadZipFile):
        return None


class ShardedSpikeDatasetWriter:
    """Append batches; each flush writes one shard + one journal line.

    With `resume=True`, an existing journal is replayed: complete shards
    (journal entry present AND shard file on disk) are kept, and
    `resume_file_index` tells the caller the last input-file index already
    featurized, so it can skip straight past it. Entries written without
    file indices (legacy appends) cannot anchor a resume, so they force a
    fresh start.
    """

    def __init__(
        self,
        root: Path,
        shard_size: int = 8192,
        resume: bool = False,
        compress: bool = True,
        fingerprint: Optional[str] = None,
        meta: Optional[dict] = None,
    ):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.shard_size = shard_size
        # Spike trains compress ~190:1 under zlib, but single-core inflate
        # becomes the streaming-read bottleneck at corpus scale; compress=False
        # trades ~190x disk for decompression-free reads.
        self.compress = compress
        # Fingerprint of everything the shard contents depend on (config +
        # input file list). Resume refuses to reuse shards written under a
        # DIFFERENT fingerprint — otherwise changing e.g. the filterbank or
        # adding files (which shifts sorted file indices) between runs would
        # silently mix featurizations in one dataset.
        self.fingerprint = fingerprint
        # Descriptive metadata carried into the journal header + manifest
        # (e.g. the FrontendConfig the spikes were featurized with and the
        # class-name vocabulary), so downstream consumers — the streaming
        # trainer's --save-model bundle in particular — can recover the
        # TRUE featurization instead of assuming defaults.
        self.meta = dict(meta or {})
        self._x: List[np.ndarray] = []
        self._y: List[np.ndarray] = []
        self._f: List[np.ndarray] = []
        self._off = 0              # read offset into the FIRST buffer entry
        self._buffered = 0
        self._shards: List[dict] = []
        self._header_written = False
        self.resume_file_index = -1

        if resume:
            self._load_journal()
        if not resume or self.resume_file_index < 0:
            # Fresh run (or rejected resume): drop stale state so a crash of
            # THIS run can't be confused with the previous one's.
            (self.root / _JOURNAL).unlink(missing_ok=True)
            (self.root / _MANIFEST).unlink(missing_ok=True)
            self._shards = []
            self.resume_file_index = -1
            self._header_written = False

    def _load_journal(self) -> None:
        journal = self.root / _JOURNAL
        if not journal.exists():
            return
        entries = []
        header_fp = None
        header_meta: Optional[dict] = None
        for i, line in enumerate(journal.read_text().splitlines()):
            line = line.strip()
            if not line:
                continue
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                break  # truncated trailing line from a crash mid-append
            if "header" in e:
                header_fp = e["header"].get("fingerprint")
                header_meta = e["header"].get("meta")
                continue
            if not (self.root / e["file"]).exists():
                break  # journal ahead of disk (shouldn't happen; be safe)
            if e.get("last_file_index", -1) < 0:
                # Legacy entry without resume anchors: cannot resume safely.
                entries = []
                break
            entries.append(e)
        if entries and header_fp != self.fingerprint:
            # Shards were produced under a different config / input list.
            entries = []
        if entries:
            self._shards = entries
            self.resume_file_index = entries[-1]["last_file_index"]
            self._header_written = True
            if header_meta is not None:
                # The fingerprint matched, so the stored meta describes the
                # same featurization — keep it over the caller's copy.
                self.meta = header_meta
            # Rewrite the journal to exactly the validated prefix, dropping
            # any truncated/orphaned tail.
            with open(journal, "w") as f:
                f.write(json.dumps(self._header()) + "\n")
                for e in entries:
                    f.write(json.dumps(e) + "\n")

    def _header(self) -> dict:
        h = {"fingerprint": self.fingerprint}
        if self.meta:
            h["meta"] = self.meta
        return {"header": h}

    def completed_shards(self) -> List[dict]:
        return list(self._shards)

    def append(
        self,
        x_spikes: np.ndarray,
        y_labels: np.ndarray,
        file_indices: Optional[np.ndarray] = None,
    ) -> None:
        """Buffer one batch. `file_indices` (per-sample indices into the
        caller's input file list) anchor crash-resume; without them the
        shards are still written but the run is not resumable."""
        if x_spikes.shape[0] != y_labels.shape[0]:
            raise ValueError("batch length mismatch")
        if file_indices is None:
            file_indices = np.full(x_spikes.shape[0], -1, np.int64)
        elif len(file_indices) != x_spikes.shape[0]:
            raise ValueError("file_indices length mismatch")
        self._x.append(np.asarray(x_spikes, np.uint8))
        self._y.append(np.asarray(y_labels, np.int32))
        self._f.append(np.asarray(file_indices, np.int64))
        self._buffered += x_spikes.shape[0]
        while self._buffered >= self.shard_size:
            self._flush_shard(self.shard_size)

    def _take(self, n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pop exactly n buffered rows, O(n): consume the buffer list via
        sliced views + a read offset (same scheme as iter_batches.pop).
        The previous concatenate-everything-per-flush form copied the full
        remaining buffer on EVERY shard flush — O(N^2/shard_size) memcpy
        when a caller appends a large batch at once."""
        parts_x, parts_y, parts_f = [], [], []
        need = n
        while need:
            x0 = self._x[0]
            take = min(need, x0.shape[0] - self._off)
            sl = slice(self._off, self._off + take)
            parts_x.append(x0[sl])
            parts_y.append(self._y[0][sl])
            parts_f.append(self._f[0][sl])
            need -= take
            if self._off + take == x0.shape[0]:
                self._x.pop(0)
                self._y.pop(0)
                self._f.pop(0)
                self._off = 0
            else:
                self._off += take
        self._buffered -= n
        if len(parts_x) == 1:
            return parts_x[0], parts_y[0], parts_f[0]
        return (np.concatenate(parts_x, axis=0),
                np.concatenate(parts_y, axis=0),
                np.concatenate(parts_f, axis=0))

    def _flush_shard(self, n: int) -> None:
        shard_x, shard_y, shard_f = self._take(n)
        idx = len(self._shards)
        name = f"shard_{idx:05d}.npz"
        save = np.savez_compressed if self.compress else np.savez
        save(self.root / name, X_spikes=shard_x, y_labels=shard_y)
        entry = {
            "file": name,
            "num_samples": int(shard_x.shape[0]),
            "last_file_index": int(shard_f[-1]) if shard_f.shape[0] else -1,
            # Per-shard stats so consumers (the stage-1 CLI's summary in
            # particular) never need load_all at corpus scale.
            "spikes": int(shard_x.sum(dtype=np.int64)),
            "row_shape": list(shard_x.shape[1:]),
        }
        self._shards.append(entry)
        # The incremental manifest: journal the shard the moment it exists.
        with open(self.root / _JOURNAL, "a") as jf:
            if not self._header_written:
                jf.write(json.dumps(self._header()) + "\n")
                self._header_written = True
            jf.write(json.dumps(entry) + "\n")
            jf.flush()

    def close(self) -> dict:
        if self._buffered:
            self._flush_shard(self._buffered)
        manifest = {
            "format": _FORMAT,
            "num_samples": int(sum(s["num_samples"] for s in self._shards)),
            "shards": self._shards,
        }
        if self.meta:
            manifest["meta"] = self.meta
        (self.root / _MANIFEST).write_text(json.dumps(manifest, indent=2))
        return manifest


class ShardedSpikeDataset:
    """Reader: iterate shards or fixed-size batches without loading all.

    Falls back to the journal when only it exists (e.g. inspecting a
    crashed run's partial output)."""

    def __init__(self, root: Path):
        self.root = Path(root)
        manifest_path = self.root / _MANIFEST
        if manifest_path.exists():
            self.manifest = json.loads(manifest_path.read_text())
            if self.manifest.get("format") != _FORMAT:
                raise ValueError("unknown sharded dataset format")
        elif (self.root / _JOURNAL).exists():
            # The journal IS the crashed-run artifact: a kill mid-append
            # leaves a truncated trailing line, and a kill between journal
            # append and shard fsync can reference a missing file — keep
            # the valid, on-disk prefix (mirrors the writer's _load_journal).
            shards: List[dict] = []
            journal_meta: Optional[dict] = None
            for line in (self.root / _JOURNAL).read_text().splitlines():
                if not line.strip():
                    continue
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    break                      # truncated tail: stop here
                if "header" in e:
                    journal_meta = e["header"].get("meta")
                    continue
                if not (self.root / e["file"]).exists():
                    break
                shards.append(e)
            self.manifest = {
                "format": _FORMAT,
                "num_samples": int(sum(s["num_samples"] for s in shards)),
                "shards": shards,
                "partial": True,
            }
            if journal_meta:
                self.manifest["meta"] = journal_meta
        else:
            raise FileNotFoundError(f"no manifest or journal at {self.root}")

    @property
    def num_samples(self) -> int:
        return self.manifest["num_samples"]

    @property
    def meta(self) -> dict:
        """Writer-recorded metadata ({} for datasets written before it
        existed): 'frontend' (FrontendConfig dict — see
        config.frontend_from_dict) and 'class_names'."""
        return self.manifest.get("meta", {})

    @property
    def is_partial(self) -> bool:
        return bool(self.manifest.get("partial", False))

    @property
    def total_spikes(self) -> Optional[int]:
        """Corpus spike count from the per-shard journal stats; None for
        datasets written before the stats existed."""
        shards = self.manifest["shards"]
        if not shards:
            return 0
        if any("spikes" not in s for s in shards):
            return None
        return int(sum(s["spikes"] for s in shards))

    @property
    def row_shape(self) -> Optional[tuple]:
        """(channels, time) of one spike row, from the journal stats;
        None for datasets written before the stats existed."""
        shards = self.manifest["shards"]
        if shards and "row_shape" in shards[0]:
            return tuple(shards[0]["row_shape"])
        return None

    @property
    def x_spikes(self) -> np.ndarray:
        """MATERIALIZED spike tensor (cached load_all) — convenience for
        reference-scale corpora; corpus-scale consumers stream via
        iter_batches/iter_shards instead."""
        return self._materialized().x_spikes

    @property
    def y_labels(self) -> np.ndarray:
        return self._materialized().y_labels

    def _materialized(self) -> SpikeDataset:
        cached = getattr(self, "_all", None)
        if cached is None:
            cached = self._all = self.load_all()
        return cached

    def _load_shard(self, s: dict) -> SpikeDataset:
        # Uncompressed shards mmap straight out of the zip container:
        # zipfile's read path copies the whole member through ZipExtFile
        # AND CRC-checks every byte even for STORED entries — measured as
        # the dominant host cost of the corpus-scale streaming passes
        # (docs/VALIDATION.md round-5 note). A memmap view faults in only
        # the pages actually consumed (gather_rows of 500 calibration
        # rows over a multi-GB corpus touches ~25 MB), and the batch
        # assembly copies only the mask-selected rows once.
        path = self.root / s["file"]
        x = _mmap_npz_member(path, "X_spikes")
        y = _mmap_npz_member(path, "y_labels")
        if x is not None and y is not None:
            return SpikeDataset(x_spikes=x, y_labels=np.asarray(y))
        data = np.load(path)
        return SpikeDataset(x_spikes=data["X_spikes"], y_labels=data["y_labels"])

    def iter_shards(self, prefetch: bool = False) -> Iterator[SpikeDataset]:
        """Yield shards in order. With `prefetch`, the NEXT shard loads and
        decompresses on a background thread while the caller consumes the
        current one. Default OFF: on a single-core host the prefetch thread
        competes with the consumer's own marshalling work and measured 35%
        SLOWER at 100k-utterance scale; enable it on multi-core hosts."""
        shards = self.manifest["shards"]
        if not prefetch or len(shards) <= 1:
            for s in shards:
                yield self._load_shard(s)
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(self._load_shard, shards[0])
            for nxt in shards[1:]:
                cur = fut.result()
                fut = pool.submit(self._load_shard, nxt)
                yield cur
            yield fut.result()

    def iter_batches(
        self, batch_size: int, mask: Optional[np.ndarray] = None
    ) -> Iterator[SpikeDataset]:
        """Re-chunk shards into exact batch_size batches (last may be short).

        `mask` (global row mask, file order) streams only the selected
        rows, still loading each shard exactly once — how the streaming
        trainer walks train rows on pass 1 and test rows on pass 2 without
        paying the reservoir simulation for unselected rows.

        O(N) total copies: pending shard arrays are consumed via sliced
        VIEWS with a read offset; each emitted batch is assembled with one
        concatenate of exactly batch_size rows. (The previous
        concatenate-the-whole-buffer-per-yield form was O(shard_size^2)
        memcpy per shard and bottlenecked 100k-corpus streaming at ~170
        utt/s.)
        """
        pending: List[Tuple[np.ndarray, np.ndarray, int]] = []
        n_pending = 0
        offset = 0

        def pop(n: int) -> SpikeDataset:
            nonlocal n_pending
            parts_x, parts_y = [], []
            need = n
            while need:
                x, y, off = pending[0]
                take = min(need, x.shape[0] - off)
                parts_x.append(x[off : off + take])
                parts_y.append(y[off : off + take])
                need -= take
                n_pending -= take
                if off + take == x.shape[0]:
                    pending.pop(0)
                else:
                    pending[0] = (x, y, off + take)
            if len(parts_x) == 1:
                return SpikeDataset(parts_x[0], parts_y[0])
            return SpikeDataset(
                np.concatenate(parts_x, axis=0), np.concatenate(parts_y, axis=0)
            )

        for shard in self.iter_shards():
            x, y = shard.x_spikes, shard.y_labels
            if mask is not None:
                m = np.asarray(mask[offset:offset + x.shape[0]])
                offset += x.shape[0]
                if not m.any():
                    continue
                x, y = x[m], y[m]
            pending.append((x, y, 0))
            n_pending += x.shape[0]
            while n_pending >= batch_size:
                yield pop(batch_size)
        if n_pending:
            yield pop(n_pending)

    def labels(self) -> np.ndarray:
        """All labels in file order, reading only each shard's label member.

        npz members decompress lazily on access, so this never touches the
        spike tensors — the split and class bookkeeping for the streaming
        trainer (pipeline.extract_and_train_streaming) stay O(N) ints.
        """
        out = []
        for s in self.manifest["shards"]:
            with np.load(self.root / s["file"]) as data:
                out.append(np.asarray(data["y_labels"]))
        if not out:
            return np.zeros((0,), np.int64)
        return np.concatenate(out)

    def gather_rows(self, indices: np.ndarray) -> np.ndarray:
        """Spike rows at the given global indices, returned in the given
        order, loading each touched shard at most once (e.g. the first-500
        calibration subset, which is scattered across shards by the split)."""
        indices = np.asarray(indices, np.int64)
        bounds = np.cumsum(
            [0] + [int(s["num_samples"]) for s in self.manifest["shards"]]
        )
        if indices.size and (indices.min() < 0 or indices.max() >= bounds[-1]):
            raise IndexError("row index out of range for sharded dataset")
        shard_of = np.searchsorted(bounds, indices, side="right") - 1
        out = None
        for si in np.unique(shard_of):
            pos = np.nonzero(shard_of == si)[0]
            shard = self._load_shard(self.manifest["shards"][si])
            rows = shard.x_spikes[indices[pos] - bounds[si]]
            if out is None:
                out = np.empty((indices.size,) + rows.shape[1:], rows.dtype)
            out[pos] = rows
        if out is None:
            # Preserve the rank/dtype contract for the empty selection so
            # callers' shape arithmetic fails informatively, not with an
            # IndexError on a rank-1 float array.
            shape = self.row_shape or (0, 0)
            return np.zeros((0,) + tuple(shape), np.uint8)
        return out

    def load_all(self) -> SpikeDataset:
        xs, ys = [], []
        for shard in self.iter_shards():
            xs.append(shard.x_spikes)
            ys.append(shard.y_labels)
        return SpikeDataset(np.concatenate(xs), np.concatenate(ys))
