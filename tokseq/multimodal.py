"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with the Spark-side plumbing (schema, Arrow batching,
partitioning, UDF signatures) fully real and tested.

The actual media decode (JPEG/PCM/container parsing) is STUBBED — the
image/audio libraries are not in this container — behind
``_decode_payload``: a clearly-marked deterministic fake that parses
our own synthetic header and derives features from payload bytes. Swap
``_decode_payload`` for a real decoder (PIL/torchaudio/pyav) and
nothing else changes: the mapInArrow batch shape, schemas, and
partitioning are production-real.

Schema:
    item_id  string
    modality string        ('image' | 'audio')
    payload  binary        opaque media bytes
    width/height int       (image) | sample_rate/n_samples int (audio)
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = (
    "item_id string, modality string, payload binary, "
    "width int, height int, sample_rate int, n_samples int"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = f"item_id string, modality string, feature array<float>"

_MAGIC = b"TSQM"


def synth_media_table(n_items: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media blobs: 4-byte magic + dims header +
    seeded bytes. Stands in for a real landing table of media files."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("item_id", "modality", "payload", "width",
                            "height", "sample_rate", "n_samples")}
    for i in range(n_items):
        if i % 2 == 0:
            w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
            body = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
            rows["modality"].append("image")
            rows["width"].append(w)
            rows["height"].append(h)
            rows["sample_rate"].append(None)
            rows["n_samples"].append(None)
        else:
            sr, ns = 16000, int(rng.integers(100, 1000))
            body = rng.integers(0, 256, 2 * ns, dtype=np.uint8).tobytes()
            rows["modality"].append("audio")
            rows["width"].append(None)
            rows["height"].append(None)
            rows["sample_rate"].append(sr)
            rows["n_samples"].append(ns)
        rows["item_id"].append(f"item-{i:06d}")
        rows["payload"].append(_MAGIC + body)
    return pa.table(
        {
            "item_id": pa.array(rows["item_id"], pa.string()),
            "modality": pa.array(rows["modality"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
            "n_samples": pa.array(rows["n_samples"], pa.int32()),
        }
    )


def _decode_payload(payload: bytes, modality: str) -> np.ndarray:
    """STUB media decode (deterministic fake).

    A real deployment replaces this body with e.g. PIL.Image.open /
    soundfile.read; the container lacks those libs, so we derive a
    deterministic FEATURE_DIM-vector from rolling crc32 windows of the
    payload — stable, content-sensitive, and exercising the exact same
    batch path a real decoder would."""
    if not payload.startswith(_MAGIC):
        raise ValueError("bad media payload (missing magic)")
    body = payload[len(_MAGIC):]
    step = max(1, len(body) // FEATURE_DIM)
    feats = [
        (zlib.crc32(body[i * step:(i + 1) * step + 1]) % 10_000) / 10_000.0
        for i in range(FEATURE_DIM)
    ]
    return np.asarray(feats, dtype=np.float32)


def _feature_map(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for b in batches:
        payloads = b.column("payload").to_pylist()
        modalities = b.column("modality").to_pylist()
        feats = np.stack(
            [_decode_payload(p, m) for p, m in zip(payloads, modalities)]
        ) if payloads else np.zeros((0, FEATURE_DIM), np.float32)
        flat = pa.array(feats.ravel(), pa.float32())
        offsets = pa.array(
            np.arange(0, (len(payloads) + 1) * FEATURE_DIM, FEATURE_DIM, dtype=np.int32)
        )
        yield pa.RecordBatch.from_arrays(
            [
                b.column("item_id"),
                b.column("modality"),
                pa.ListArray.from_arrays(offsets, flat),
            ],
            names=["item_id", "modality", "feature"],
        )


def extract_features(media_df):
    """(media schema) -> (item_id, modality, feature array<float>) via
    mapInArrow — the production batch path for media feature
    extraction; only the per-payload decode is stubbed."""
    cols = ["item_id", "modality", "payload"]
    return media_df.select(*cols).mapInArrow(_feature_map, FEATURES_SCHEMA)
