"""Vectorized per-chunk statistics over a batch of chunks.

A batch of chunks arrives as Arrow list-array storage: one flat
``values`` array plus ``offsets`` (len = n_chunks+1). All statistics
are computed with segmented numpy ops (``ufunc.reduceat`` over the
offset vector) — one pass over the batch, no per-chunk Python loop.
This is the engine's analog of the reference computing its packing
parameters per buffer while streaming 8 lanes at once
(/root/reference/src/lib.rs:36-41).

Stats produced (one array entry per chunk):
    n         chunk length
    vmin/vmax value range (0 for empty chunks)
    n_runs    number of equal-value runs
    max_run   longest run length
    card      exact distinct count (segmented sort + change count)
    bl_hist   (n_chunks, 65) histogram of bit_length(value - vmin) —
              drives the patched-FoR cost model
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .codecs.bitpack import bit_length


@dataclass
class ChunkStats:
    n: np.ndarray
    vmin: np.ndarray
    vmax: np.ndarray
    n_runs: np.ndarray
    max_run: np.ndarray
    card: np.ndarray
    bl_hist: np.ndarray  # (n_chunks, 65) int64

    @property
    def n_chunks(self) -> int:
        return len(self.n)


def _segmented_reduce(op, values, starts, empty, fill):
    # reduce only over non-empty segments: empty segments occupy zero
    # width, so non-empty starts form a strictly increasing in-bounds
    # index set and reduceat covers each segment exactly (clamping a
    # trailing-empty start into range would instead truncate the last
    # non-empty segment's reduction)
    out = np.full(len(starts), fill, dtype=np.int64)
    if len(values) == 0:
        return out
    ne = ~empty
    if ne.any():
        out[ne] = op.reduceat(values, starts[ne]).astype(np.int64)
    return out


def compute_chunk_stats(values: np.ndarray, offsets: np.ndarray) -> ChunkStats:
    # keep int32 input as int32: the kernel is memory-bandwidth-bound
    # at high core counts and these are whole-batch passes
    values = np.ascontiguousarray(values)
    if values.dtype not in (np.int32, np.int64):
        values = values.astype(np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    starts = offsets[:-1]
    n = np.diff(offsets)
    empty = n == 0
    nseg = len(n)

    vmin = _segmented_reduce(np.minimum, values, starts, empty, 0)
    vmax = _segmented_reduce(np.maximum, values, starts, empty, 0)

    # --- runs: force a change at every chunk start so runs never span chunks
    m = len(values)
    change = np.empty(m, dtype=bool)
    if m:
        change[0] = True
        np.not_equal(values[1:], values[:-1], out=change[1:])
        change[starts[~empty]] = True
    run_starts = np.flatnonzero(change)
    if len(run_starts):
        run_lens = np.empty(len(run_starts), dtype=np.int64)
        run_lens[:-1] = run_starts[1:] - run_starts[:-1]
        run_lens[-1] = m - run_starts[-1]
    else:
        run_lens = run_starts
    # which chunk each run belongs to
    run_seg = np.searchsorted(starts, run_starts, side="right") - 1 if m else run_starts
    n_runs = np.bincount(run_seg, minlength=nseg).astype(np.int64) if m else np.zeros(nseg, np.int64)
    run_starts_per_seg = np.concatenate(([0], np.cumsum(n_runs)))[:-1]
    max_run = _segmented_reduce(np.maximum, run_lens, run_starts_per_seg, n_runs == 0, 0)

    # --- exact cardinality: one composite-key sort then count changes.
    # composite (seg << 32 | delta) is safe because delta < 2^32 implies
    # no cross-seg collision; fall back to lexsort for wider deltas.
    if m:
        seg_of = np.repeat(np.arange(nseg, dtype=np.int32), n)
        deltas = values - vmin.astype(values.dtype)[seg_of]
        if int(deltas.max()) < (1 << 32) and nseg < (1 << 31):
            key = np.sort(
                (seg_of.astype(np.int64) << 32) | deltas.astype(np.int64)
            )
            uniq_flag = np.empty(m, dtype=bool)
            uniq_flag[0] = True
            np.not_equal(key[1:], key[:-1], out=uniq_flag[1:])
            card = np.bincount(
                (key[uniq_flag] >> 32), minlength=nseg
            ).astype(np.int64)
        else:
            order = np.lexsort((values, seg_of))
            sv = values[order]
            ss = seg_of[order]
            uniq_flag = np.empty(m, dtype=bool)
            uniq_flag[0] = True
            uniq_flag[1:] = (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1])
            card = np.bincount(ss[uniq_flag], minlength=nseg).astype(np.int64)
    else:
        card = np.zeros(nseg, np.int64)

    # --- bit-length histogram of (value - chunk_min), via flat bincount
    bl_hist = np.zeros((nseg, 65), dtype=np.int64)
    if m:
        bl = bit_length(deltas).astype(np.int32, copy=False)
        bl_hist = np.bincount(
            seg_of * np.int32(65) + bl, minlength=nseg * 65
        ).reshape(nseg, 65).astype(np.int64)

    return ChunkStats(n=n, vmin=vmin, vmax=vmax, n_runs=n_runs,
                      max_run=max_run, card=card, bl_hist=bl_hist)
