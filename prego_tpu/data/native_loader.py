"""Native-backed recognition data source.

Same semantics as prego_tpu.data.features.load_feature_store +
WindowSampler (including the training zero-prefix, dataset.py:53-55, and
zeroed-flow quirks, dataset.py:63-69) but backed by the C++ mmap feature
store (prego_tpu/native): nothing is eagerly loaded, and training batches
are assembled by the native thread pool straight from the OS page cache —
replacing the reference's 4 DataLoader worker processes with in-process
parallel memcpy. The zero prefix is virtual: window starts are shifted by
-(window_size-1) and out-of-range rows are zero-filled by the gather
kernel, so no padded copies are ever materialized.
"""

from __future__ import annotations

import os.path as osp
from typing import Iterator, List, Optional

import numpy as np

from prego_tpu.data.features import (
    CORRUPT_VIDEOS,
    FEATURE_SIZES,
    ZEROED_FLOW_TYPE,
)
from prego_tpu.data.windowing import Batch
from prego_tpu.native import NativeFeatureStore


class _LazyVideo:
    """Sliceable view of one video's rows in a native store (virtual
    zero-prefix applied); materializes only the requested range."""

    def __init__(self, fs: NativeFeatureStore, idx: int, pad: int, length: int,
                 zero_dim: Optional[int] = None):
        self._fs = fs
        self._idx = idx
        self._pad = pad
        self._len = length
        self._zero_dim = zero_dim  # structurally-zero stream (flow quirk)

    @property
    def shape(self):
        dim = self._zero_dim if self._zero_dim is not None else self._fs.dims(self._idx)[1]
        return (self._len, dim)

    def __len__(self):
        return self._len

    def __getitem__(self, key):
        if isinstance(key, slice):
            start, stop, step = key.indices(self._len)
            if step != 1:
                raise ValueError("only contiguous slices supported")
            if self._zero_dim is not None:
                return np.zeros((stop - start, self._zero_dim), np.float32)
            return self._fs.read_rows(self._idx, start - self._pad, stop - start)
        raise TypeError("index videos with contiguous slices")

    def __array__(self, dtype=None, copy=None):
        out = self[0 : self._len]
        return out.astype(dtype) if dtype is not None else out


class _LazyColumn:
    def __init__(self, data: "NativeRecognitionData", which: str):
        self._d = data
        self._which = which

    def __getitem__(self, vid: str) -> _LazyVideo:
        d = self._d
        i = d.vids.index(vid)
        idx = int(d._indices[i])
        if self._which == "rgb":
            return _LazyVideo(d._rgb, idx, d.pad, d.length(vid))
        if self._which == "target":
            return _LazyVideo(d._tgt, idx, d.pad, d.length(vid))
        if d._flow is None:  # zeroed flow quirk: zeros on demand
            return _LazyVideo(d._rgb, idx, d.pad, d.length(vid), zero_dim=d.flow_dim)
        return _LazyVideo(d._flow, idx, d.pad, d.length(vid))


class NativeRecognitionData:
    """Lazy rgb/flow/target stores for one split. Exposes the FeatureStore
    surface (vids / length / flow_is_zero / rgb / flow / target dict-style
    views) so samplers AND the lazy evaluator run off the mmap directly."""

    def __init__(
        self,
        root_path: str,
        vids: List[str],
        rgb_type: str,
        flow_type: str,
        annotation_type: str,
        num_classes: int,
        training: bool,
        window_size: int,
        n_threads: int = 4,
        logger=None,
    ):
        vids = [v for v in vids if v not in CORRUPT_VIDEOS]
        self.training = training
        self.window_size = window_size
        self.pad = window_size - 1 if training else 0
        self.rgb_dim = FEATURE_SIZES[rgb_type]
        self.flow_dim = FEATURE_SIZES[flow_type]
        self.num_classes = num_classes
        self.flow_is_zero = flow_type == ZEROED_FLOW_TYPE

        rgb_paths = [osp.join(root_path, rgb_type, v + ".npy") for v in vids]
        tgt_paths = [osp.join(root_path, annotation_type, v + ".npy") for v in vids]
        if self.flow_is_zero:
            flow_paths = None
        else:
            flow_paths = [
                osp.join(
                    root_path, flow_type, "assembly_optical_flow_BNInception",
                    v, "assembling.npy",
                )
                for v in vids
            ]

        self._rgb = NativeFeatureStore(rgb_paths, n_threads)
        self._tgt = NativeFeatureStore(tgt_paths, n_threads)
        self._flow = NativeFeatureStore(flow_paths, n_threads) if flow_paths else None

        ok = self._rgb.ok & self._tgt.ok
        if self._flow is not None:
            ok = ok & self._flow.ok
        self.removed = int((~ok).sum())
        if logger is not None and self.removed:
            for v, good in zip(vids, ok):
                if not good:
                    logger.info(f"dropped video {v} (missing features)")
        # keep index alignment with the native stores; skip bad slots
        self.vids = [v for v, good in zip(vids, ok) if good]
        self._indices = np.flatnonzero(ok).astype(np.int32)
        self._lengths = {
            v: self._tgt.dims(int(i))[0] + self.pad
            for v, i in zip(self.vids, self._indices)
        }
        self.rgb = _LazyColumn(self, "rgb")
        self.flow = _LazyColumn(self, "flow")
        self.target = _LazyColumn(self, "target")

    def length(self, vid: str) -> int:
        """Video length including the virtual training prefix."""
        return self._lengths[vid]

    def gather(self, vid_order: np.ndarray, starts: np.ndarray, window: int):
        """vid_order indexes into self.vids; starts are VIRTUAL (prefixed)."""
        native_idx = self._indices[vid_order]
        real_starts = starts - self.pad
        rgb = self._rgb.gather_windows(native_idx, real_starts, window, self.rgb_dim)
        tgt = self._tgt.gather_windows(native_idx, real_starts, window, self.num_classes)
        if self._flow is not None:
            flow = self._flow.gather_windows(native_idx, real_starts, window, self.flow_dim)
        else:
            flow = np.zeros((len(vid_order), window, self.flow_dim), np.float32)
        return rgb, flow, tgt

    def gather_async(
        self, vid_order: np.ndarray, starts: np.ndarray, window: int
    ) -> "_PendingBatch":
        """Background variant of gather: the native thread pool assembles
        the batch while the caller's current step runs (double buffering)."""
        native_idx = self._indices[vid_order]
        real_starts = starts - self.pad
        p_rgb = self._rgb.gather_windows_async(
            native_idx, real_starts, window, self.rgb_dim
        )
        p_tgt = self._tgt.gather_windows_async(
            native_idx, real_starts, window, self.num_classes
        )
        p_flow = (
            self._flow.gather_windows_async(
                native_idx, real_starts, window, self.flow_dim
            )
            if self._flow is not None
            else None
        )
        return _PendingBatch(p_rgb, p_flow, p_tgt, len(vid_order), window, self.flow_dim)


class _PendingBatch:
    def __init__(self, p_rgb, p_flow, p_tgt, count: int, window: int, flow_dim: int):
        self._p = (p_rgb, p_flow, p_tgt)
        self._zeros = (count, window, flow_dim)

    def wait(self):
        p_rgb, p_flow, p_tgt = self._p
        rgb = p_rgb.wait()
        tgt = p_tgt.wait()
        flow = (
            p_flow.wait() if p_flow is not None else np.zeros(self._zeros, np.float32)
        )
        return rgb, flow, tgt


class NativeWindowSampler:
    """Reference windowing semantics over the native store
    (dataset.py:113-119: per-epoch random offset, strided windows)."""

    def __init__(self, data: NativeRecognitionData, window_size: int, stride: int):
        self.data = data
        self.window_size = window_size
        self.stride = stride
        self.windows: List = []

    def resample(self, rng: Optional[np.random.Generator] = None) -> None:
        rng = rng or np.random.default_rng()
        self.windows = []
        for vi, vid in enumerate(self.data.vids):
            T = self.data.length(vid)
            offset = int(rng.integers(0, self.stride))
            start = offset
            while start + self.window_size <= T:
                self.windows.append((vi, start))
                start += self.stride

    def __len__(self) -> int:
        return len(self.windows)

    def num_batches(self, batch_size: int) -> int:
        return (len(self.windows) + batch_size - 1) // batch_size

    def iter_batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        rng: Optional[np.random.Generator] = None,
        prefetch: bool = True,
    ) -> Iterator[Batch]:
        """With prefetch=True (default), batch i+1 is assembled by the
        native thread pool while batch i is being consumed (typically: while
        the accelerator runs the training step) — one batch of lookahead,
        two buffers in flight."""
        if not self.windows:
            self.resample(rng)
        order = np.arange(len(self.windows))
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        W = self.window_size
        win = np.asarray(self.windows, np.int64)

        metas = []
        for b0 in range(0, len(order), batch_size):
            idxs = order[b0 : b0 + batch_size]
            n = len(idxs)
            vid_order = win[idxs, 0]
            starts = win[idxs, 1]
            if n < batch_size:  # pad the trailing batch (masked in the loss)
                vid_order = np.concatenate([vid_order, np.zeros(batch_size - n, np.int64)])
                starts = np.concatenate(
                    [starts, np.full(batch_size - n, -(10 ** 9), np.int64)]
                )
            metas.append((vid_order, starts, n))

        pending = None
        if prefetch and metas:
            pending = self.data.gather_async(metas[0][0], metas[0][1], W)
        for i, (vid_order, starts, n) in enumerate(metas):
            if pending is not None:
                rgb, flow, tgt = pending.wait()
                pending = (
                    self.data.gather_async(metas[i + 1][0], metas[i + 1][1], W)
                    if i + 1 < len(metas)
                    else None
                )
            else:
                rgb, flow, tgt = self.data.gather(vid_order, starts, W)
            valid = np.zeros((batch_size,), np.float32)
            valid[:n] = 1.0
            vids = [self.data.vids[int(v)] for v in vid_order[:n]] + [""] * (batch_size - n)
            yield Batch(
                rgb, flow, tgt, valid, vids,
                starts.astype(np.int64), (starts + W).astype(np.int64),
            )
