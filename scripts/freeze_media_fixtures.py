#!/usr/bin/env python
"""Freeze expected outputs of the multimodal mapInArrow kernels into
parquet fixtures (the frozen-IVF-codebook move, applied to media):
the deterministic synth media/video tables are evaluated ONCE locally
(driver-side, no Spark) and the per-item results land in fixtures/*.
The driver's DuckDB oracle then reads the fixtures, which puts the
distributed feature-extraction / resize / frame-sampling kernels under
the full rows+schema+hash check — any regression in the parsers, the
batch plumbing, or the sampling arithmetic breaks the hash.

Regenerate (only when the synth tables or kernels intentionally
change):  python scripts/freeze_media_fixtures.py
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tokseq.multimodal import (  # noqa: E402
    MEDIA_FIXTURE_PARAMS,
    _decode_payload,
    _parse_avi_frame_spans,
    _parse_pnm,
    _wav_mono,
    encode_pnm,
    resize_nn,
    synth_media_table,
    synth_video_table,
)

FIXDIR = Path(__file__).resolve().parent.parent / "fixtures"

# shared with q_multimodal_features / q_multimodal_frames by
# construction — both sides read tokseq.multimodal.MEDIA_FIXTURE_PARAMS
_P = MEDIA_FIXTURE_PARAMS
N_MEDIA, N_VIDEO = _P["n_media"], _P["n_video"]
RESIZE_W, RESIZE_H = _P["resize_w"], _P["resize_h"]
AUDIO_FRAME, AUDIO_HOP = _P["frame"], _P["hop"]
VIDEO_EVERY_K = _P["every_k"]


def main() -> None:
    FIXDIR.mkdir(exist_ok=True)
    media = synth_media_table(N_MEDIA)
    video = synth_video_table(N_VIDEO)
    items = list(
        zip(
            media["item_id"].to_pylist(),
            media["modality"].to_pylist(),
            media["payload"].to_pylist(),
        )
    )

    # --- per-item float32 feature vectors (the extract_features kernel)
    feats = pa.table(
        {
            "item_id": pa.array([i for i, _, _ in items], pa.string()),
            "modality": pa.array([m for _, m, _ in items], pa.string()),
            "feature": pa.array(
                [_decode_payload(p, m).tolist() for _, m, p in items],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(feats, FIXDIR / "media_features.parquet")

    # --- nearest-neighbor resize outputs (exact bytes via md5)
    rows = [
        (i, encode_pnm(resize_nn(_parse_pnm(p), RESIZE_H, RESIZE_W)))
        for i, m, p in items
        if m == "image"
    ]
    pq.write_table(
        pa.table(
            {
                "item_id": pa.array([i for i, _ in rows], pa.string()),
                "n_bytes": pa.array([len(b) for _, b in rows], pa.int64()),
                "payload_md5": pa.array(
                    [hashlib.md5(b).hexdigest() for _, b in rows], pa.string()
                ),
            }
        ),
        FIXDIR / "media_resize.parquet",
    )

    # --- strided audio frame stats (same vectorized math as the kernel)
    ids, fidx, rms_o, zcr_o = [], [], [], []
    for i, m, p in items:
        if m != "audio":
            continue
        s = _wav_mono(p)
        n_frames = (
            max(0, (len(s) - AUDIO_FRAME) // AUDIO_HOP + 1)
            if len(s) >= AUDIO_FRAME
            else 0
        )
        if not n_frames:
            continue
        idx = (
            np.arange(AUDIO_FRAME)[None, :]
            + AUDIO_HOP * np.arange(n_frames)[:, None]
        )
        win = s[idx]
        rms = np.sqrt((win * win).mean(axis=1)) / 32768.0
        zc = (np.signbit(win[:, 1:]) != np.signbit(win[:, :-1])).mean(axis=1)
        ids += [i] * n_frames
        fidx += list(range(n_frames))
        rms_o += rms.tolist()
        zcr_o += zc.tolist()
    pq.write_table(
        pa.table(
            {
                "item_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "rms": pa.array(np.asarray(rms_o, np.float32), pa.float32()),
                "zcr": pa.array(np.asarray(zcr_o, np.float32), pa.float32()),
            }
        ),
        FIXDIR / "media_audio_frames.parquet",
    )

    # --- sampled video frames (container-walk spans, every k-th frame)
    ids, fidx, sizes, md5s = [], [], [], []
    for i, p in zip(video["item_id"].to_pylist(), video["payload"].to_pylist()):
        spans = _parse_avi_frame_spans(p)
        for j in range(0, len(spans), VIDEO_EVERY_K):
            o, s = spans[j]
            ids.append(i)
            fidx.append(j)
            sizes.append(s)
            md5s.append(hashlib.md5(p[o : o + s]).hexdigest())
    pq.write_table(
        pa.table(
            {
                "item_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame_bytes": pa.array(sizes, pa.int64()),
                "frame_md5": pa.array(md5s, pa.string()),
            }
        ),
        FIXDIR / "media_video_frames.parquet",
    )
    for f in sorted(FIXDIR.glob("media_*.parquet")):
        print(f, pq.read_metadata(f).num_rows, "rows")


if __name__ == "__main__":
    main()
