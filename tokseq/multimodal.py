"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with the Spark-side plumbing (schema, Arrow batching,
partitioning, UDF signatures) fully real and tested.

Media decode is REAL — pure numpy, no external libs — for the
standard UNCOMPRESSED formats:

  * netpbm ``P5`` (grayscale) / ``P6`` (RGB) images: ASCII header
    (whitespace/comment tolerant) + raw big-endian sample bytes;
  * RIFF/WAVE PCM16 audio: chunk walk to ``fmt `` + ``data``.

COMPRESSED formats (JPEG/PNG/MP3/MP4) genuinely require external
codecs (PIL / soundfile / pyav — absent in this container) and raise
``NotImplementedError`` naming the swap-in point: replace the
matching branch of :func:`decode_media` and nothing else changes —
the mapInArrow batch shape, schemas, and partitioning are
production-real. Legacy ``TSQM`` synthetic blobs from earlier rounds
stay decodable.

Ops provided (each a real distributed op over the binary column):
  * :func:`extract_features`  — decode + fixed-dim feature vector
  * :func:`resize_images`     — decode -> nearest-neighbor resize ->
                                re-encoded P5/P6 payload
  * :func:`audio_frame_stats` — decode -> strided frame explode with
                                per-frame RMS / zero-crossing rate

Schema:
    item_id  string
    modality string        ('image' | 'audio')
    payload  binary        opaque media bytes
    width/height int       (image) | sample_rate/n_samples int (audio)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = (
    "item_id string, modality string, payload binary, "
    "width int, height int, sample_rate int, n_samples int"
)

FEATURE_DIM = 16

# single source of truth for the parameters the multimodal driver
# queries (tokseq/queries.py q_multimodal_*) AND the frozen-fixture
# freeze script (scripts/freeze_media_fixtures.py) must agree on: if a
# query changed these independently, the committed fixtures would stop
# matching and the drift would surface only as a driver hash mismatch.
MEDIA_FIXTURE_PARAMS = {
    "n_media": 128,   # synth_media_table size
    "n_video": 32,    # synth_video_table size
    "resize_w": 16,   # resize_images out_w
    "resize_h": 12,   # resize_images out_h
    "frame": 128,     # audio_frame_stats frame
    "hop": 64,        # audio_frame_stats hop
    "every_k": 4,     # sample_video_frames stride
}

FEATURES_SCHEMA = "item_id string, modality string, feature array<float>"

RESIZED_SCHEMA = "item_id string, payload binary, width int, height int"

FRAMES_SCHEMA = "item_id string, frame_idx int, rms float, zcr float"

_MAGIC = b"TSQM"  # legacy synthetic blobs (rounds 1-4)


def _compressed_format(payload: bytes) -> str | None:
    """Name the compressed format a payload starts with, or None.
    Recognition must be broad (any ftyp box size, all MP3 frame-sync
    variants): a recognized-but-undecodable format must raise
    NotImplementedError naming the swap-in library, not a generic
    bad-payload error."""
    if payload[:3] == b"\xff\xd8\xff":
        return "JPEG (needs PIL)"
    if payload[:4] == b"\x89PNG":
        return "PNG (needs PIL)"
    if payload[:3] == b"ID3":
        return "MP3 (needs soundfile/av)"
    # MPEG audio frame sync: 11 set bits (0xFF then top 3 bits set)
    if len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        return "MP3 (needs soundfile/av)"
    # ISO BMFF: 'ftyp' box at offset 4, any box size
    if payload[4:8] == b"ftyp":
        return "MP4 (needs pyav)"
    return None


# ---------------------------------------------------------------- netpbm


def _parse_pnm(payload: bytes) -> np.ndarray:
    """Decode a binary netpbm image: P5 -> (h, w) uint8, P6 ->
    (h, w, 3) uint8. Header is ASCII tokens (magic, width, height,
    maxval) separated by whitespace, ``#`` comments allowed."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    # tokenize the header byte-by-byte (comments run to end of line)
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[i : i + 1]
        if c == b"#":
            nl = payload.find(b"\n", i)
            i = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    w, h, maxval = tokens
    if w <= 0 or h <= 0:
        # a negative header token would make `need` negative below and
        # frombuffer(count<0) silently reads all remaining bytes
        raise ValueError(f"bad netpbm dimensions {w}x{h}")
    if maxval > 255 or maxval < 1:
        raise ValueError("only 8-bit netpbm supported")
    i += 1  # exactly ONE whitespace byte separates header from raster
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(payload) - i < need:
        raise ValueError("truncated netpbm raster")
    raster = np.frombuffer(payload, np.uint8, count=need, offset=i)
    if maxval != 255:
        # normalize to the full 8-bit range (maxval = white per the
        # netpbm spec), round-to-nearest, so features and re-encoded
        # payloads (maxval 255) keep their meaning
        raster = (
            (raster.astype(np.uint32) * 255 + maxval // 2) // maxval
        ).astype(np.uint8)
    return raster.reshape((h, w, 3)) if ch == 3 else raster.reshape((h, w))


def encode_pnm(arr: np.ndarray) -> bytes:
    """Inverse of :func:`_parse_pnm` (maxval 255)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic = b"P5"
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"bad image shape {arr.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# ---------------------------------------------------------------- wav


def _parse_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM16: returns (samples int16, sample_rate).
    Mono returns shape (n,); multichannel returns (n_frames, n_ch) —
    channels DE-interleaved so downstream math never mixes channels.
    Walks chunks so extra metadata chunks (LIST etc.) before ``data``
    are handled."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, n_ch, data = 12, None, 1, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if size == 0xFFFFFFFF and cid == b"data":
            # streaming/pipe-written WAVs mark an unknown data size
            # with 0xFFFFFFFF: clamp to the available bytes
            size = len(payload) - pos - 8
        if pos + 8 + size > len(payload):
            raise ValueError("truncated WAV chunk")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt_tag, n_ch, sr = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM16 WAV decodes in-sandbox; compressed WAV "
                    "needs soundfile — swap decode_media's RIFF branch"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(data) % 2:
        raise ValueError("truncated WAV data (odd byte count for PCM16)")
    samples = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        samples = samples[: len(samples) // n_ch * n_ch].reshape(-1, n_ch)
    return samples, int(sr)


def _wav_mono(payload: bytes) -> np.ndarray:
    """PCM16 WAV -> mono float64 samples (multichannel averaged)."""
    s, _ = _parse_wav(payload)
    return s.mean(axis=1) if s.ndim == 2 else s.astype(np.float64)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal PCM16 WAV writer (inverse of :func:`_parse_wav`).
    1-D input writes mono; (n_frames, n_ch) input interleaves."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    n_ch = 1 if arr.ndim == 1 else arr.shape[1]
    body = arr.tobytes()  # C order == interleaved for (n, ch)
    block = 2 * n_ch
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, 16
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# ---------------------------------------------------------------- decode


def decode_media(payload: bytes, modality: str) -> np.ndarray:
    """payload bytes -> sample array. REAL decode for P5/P6 images
    ((h,w[,3]) uint8) and PCM16 WAV (int16, (n,) mono / (n,ch)
    multichannel); legacy TSQM fakes return their body bytes;
    recognized compressed formats raise NotImplementedError naming
    the library to swap in."""
    if payload[:2] in (b"P5", b"P6"):
        return _parse_pnm(payload)
    if payload[:4] == b"RIFF":
        if payload[8:12] == b"AVI ":
            raise NotImplementedError(
                "AVI frame DECODE needs a JPEG codec (PIL) — frame "
                "SAMPLING works without it: sample_video_frames"
            )
        return _parse_wav(payload)[0]
    if payload[:4] == _MAGIC:
        return np.frombuffer(payload, np.uint8, offset=len(_MAGIC))
    what = _compressed_format(payload)
    if what is not None:
        raise NotImplementedError(
            f"{what} — absent in this container; swap this branch "
            "of decode_media for the real decoder"
        )
    raise ValueError("bad media payload (unknown magic)")


def _decode_payload(payload: bytes, modality: str) -> np.ndarray:
    """payload -> FEATURE_DIM float32 vector in [0, 1].

    Image: [mean/255, std/127.5, 14-bin pixel histogram fractions].
    Audio: [rms/2^15, zero-crossing rate, 14-bin |sample| histogram].
    Legacy TSQM bytes featurize like a grayscale image (byte body).
    Deterministic, content-sensitive, and pure numpy."""
    raw = decode_media(payload, modality)
    k = FEATURE_DIM - 2
    if raw.dtype == np.uint8:
        flat = raw.reshape(-1).astype(np.float64)
        mean = flat.mean() / 255.0
        std = min(flat.std() / 127.5, 1.0)
        hist = np.bincount((flat // (256 / k)).astype(np.int64), minlength=k)[:k]
        feats = [mean, std] + (hist / max(1, flat.size)).tolist()
    else:
        s = raw.mean(axis=1) if raw.ndim == 2 else raw.astype(np.float64)
        rms = min(np.sqrt((s * s).mean()) / 32768.0, 1.0) if len(s) else 0.0
        zcr = float((np.signbit(s[1:]) != np.signbit(s[:-1])).mean()) if len(s) > 1 else 0.0
        a = np.abs(s)
        hist = np.bincount(
            np.minimum((a // (32768 / k)).astype(np.int64), k - 1), minlength=k
        )[:k]
        feats = [rms, zcr] + (hist / max(1, len(s))).tolist()
    return np.asarray(feats, dtype=np.float32)


# ---------------------------------------------------------------- synth


def synth_media_table(n_items: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic REAL media blobs: P6 RGB / P5 gray images and
    PCM16 WAV audio (decodable by any standard tool). Stands in for a
    real landing table of media files."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("item_id", "modality", "payload", "width",
                            "height", "sample_rate", "n_samples")}
    for i in range(n_items):
        if i % 2 == 0:
            w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
            if i % 4 == 0:
                px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            else:
                px = rng.integers(0, 256, (h, w), dtype=np.uint8)
            rows["modality"].append("image")
            rows["width"].append(w)
            rows["height"].append(h)
            rows["sample_rate"].append(None)
            rows["n_samples"].append(None)
            rows["payload"].append(encode_pnm(px))
        else:
            sr, ns = 16000, int(rng.integers(100, 1000))
            samples = (rng.integers(-(1 << 15), 1 << 15, ns)).astype("<i2")
            rows["modality"].append("audio")
            rows["width"].append(None)
            rows["height"].append(None)
            rows["sample_rate"].append(sr)
            rows["n_samples"].append(ns)
            rows["payload"].append(encode_wav(samples, sr))
        rows["item_id"].append(f"item-{i:06d}")
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


# ---------------------------------------------------------------- ops


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
    extraction; decode is real for P5/P6/WAV (module doc)."""
    cols = ["item_id", "modality", "payload"]
    return media_df.select(*cols).mapInArrow(_feature_map, FEATURES_SCHEMA)


def resize_nn(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel i maps to floor(i*in/out))."""
    h, w = arr.shape[:2]
    yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[yi][:, xi]


def resize_images(media_df, out_w: int, out_h: int):
    """Image rows -> nearest-neighbor-resized P5/P6 payloads.
    (item_id, payload, width, height); non-image rows are filtered
    Spark-side so the filter can push down on the modality column."""

    def _map(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("item_id")
            outs = [
                encode_pnm(resize_nn(_parse_pnm(p), out_h, out_w))
                for p in b.column("payload").to_pylist()
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(outs, pa.binary()),
                    pa.array([out_w] * len(outs), pa.int32()),
                    pa.array([out_h] * len(outs), pa.int32()),
                ],
                names=["item_id", "payload", "width", "height"],
            )

    img = media_df.filter(media_df.modality == "image").select("item_id", "payload")
    return img.mapInArrow(_map, RESIZED_SCHEMA)


VIDEO_FRAMES_SCHEMA = "item_id string, frame_idx int, frame binary, frame_bytes int"


def encode_avi_mjpeg(frames: list[bytes], fps: int = 30) -> bytes:
    """Minimal MJPEG-in-AVI writer: RIFF('AVI ') with a stub 'hdrl'
    LIST (avih only) and a 'movi' LIST of '00dc' frame chunks. Enough
    structure for any RIFF chunk walker; frames are stored verbatim."""
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(1, fps), 0, 0, 0, len(frames), 0, 1, 0, 0, 0, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl"
    hdrl += b"avih" + struct.pack("<I", len(avih)) + avih
    parts = [b"movi"]
    for f in frames:
        parts.append(b"00dc" + struct.pack("<I", len(f)) + f)
        if len(f) & 1:
            parts.append(b"\0")  # RIFF chunks are word-aligned
    movi_body = b"".join(parts)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_avi_frame_spans(payload: bytes) -> list[tuple[int, int]]:
    """Walk an AVI container and return (offset, size) spans of the
    FIRST video stream's frame chunks ('NNdc'/'NNdb', lowest stream
    number present) inside 'movi' LISTs — no frame bytes are copied,
    so frame SAMPLING touches only the frames it keeps. Raises on a
    truncated container (declared chunk size past end of buffer)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    by_stream: dict[bytes, list[tuple[int, int]]] = {}

    # iterative walk (explicit stack): a crafted container with ~1000
    # nested LIST headers must produce a clean ValueError path, not a
    # RecursionError on the executor
    stack: list[tuple[int, int, bool]] = [(12, len(payload), False)]
    while stack:
        pos, end, in_movi = stack.pop()
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            if pos + 8 + size > len(payload):
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                ltype = payload[pos + 8 : pos + 12]
                # resume the current level after the LIST, then descend
                stack.append((pos + 8 + size + (size & 1), end, in_movi))
                pos, end = pos + 12, pos + 8 + size
                in_movi = in_movi or ltype == b"movi"
                continue
            elif (
                in_movi
                and cid[2:4] in (b"dc", b"db")
                and cid[:2].isdigit()
            ):
                by_stream.setdefault(cid[:2], []).append((pos + 8, size))
            pos += 8 + size + (size & 1)
    if not by_stream:
        return []
    return by_stream[min(by_stream)]


def _parse_avi_frames(payload: bytes) -> list[bytes]:
    """All frame payloads of the first video stream (see
    :func:`_parse_avi_frame_spans`)."""
    return [payload[o : o + s] for o, s in _parse_avi_frame_spans(payload)]


def synth_video_table(n_items: int = 16, seed: int = 43) -> pa.Table:
    """Deterministic AVI containers of fake-JPEG frames (JPEG magic +
    seeded bytes — the codec is the stubbed part; the container is
    real)."""
    rng = np.random.default_rng(seed)
    ids, payloads, n_frames = [], [], []
    for i in range(n_items):
        k = int(rng.integers(4, 24))
        frames = [
            b"\xff\xd8\xff\xe0" + rng.integers(0, 256, int(rng.integers(64, 512)),
                                               dtype=np.uint8).tobytes()
            for _ in range(k)
        ]
        ids.append(f"vid-{i:06d}")
        payloads.append(encode_avi_mjpeg(frames))
        n_frames.append(k)
    return pa.table(
        {
            "item_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_frames": pa.array(n_frames, pa.int32()),
        }
    )


def sample_video_frames(video_df, every_k: int = 4):
    """Video rows -> every k-th frame as its own row (item_id,
    frame_idx, frame binary, frame_bytes) via mapInArrow — real
    container parsing, no codec needed. Feature extraction on the
    sampled frames would chain extract_features-style once a JPEG
    decoder is swapped in (decode_media names the spot)."""

    def _map(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids, fidx, blobs, sizes = [], [], [], []
            for item, p in zip(
                b.column("item_id").to_pylist(), b.column("payload").to_pylist()
            ):
                spans = _parse_avi_frame_spans(p)
                # slice ONLY the sampled frames — skipped frames are
                # never copied out of the container
                for j in range(0, len(spans), every_k):
                    o, s = spans[j]
                    ids.append(item)
                    fidx.append(j)
                    blobs.append(p[o : o + s])
                    sizes.append(s)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(fidx, pa.int32()),
                    pa.array(blobs, pa.binary()),
                    pa.array(sizes, pa.int32()),
                ],
                names=["item_id", "frame_idx", "frame", "frame_bytes"],
            )

    return video_df.select("item_id", "payload").mapInArrow(
        _map, VIDEO_FRAMES_SCHEMA
    )


def audio_frame_stats(media_df, frame: int = 256, hop: int = 128):
    """Audio rows -> one row per strided frame with RMS and
    zero-crossing rate — the audio analog of video frame-sampling.
    Output rows explode per item (mapInArrow batches need not be
    row-aligned with input)."""

    def _map(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids, fidx, rms_o, zcr_o = [], [], [], []
            for item, p in zip(
                b.column("item_id").to_pylist(), b.column("payload").to_pylist()
            ):
                s = _wav_mono(p)
                n_frames = max(0, (len(s) - frame) // hop + 1) if len(s) >= frame else 0
                if n_frames:
                    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
                    win = s[idx]
                    rms = np.sqrt((win * win).mean(axis=1)) / 32768.0
                    zc = (np.signbit(win[:, 1:]) != np.signbit(win[:, :-1])).mean(axis=1)
                    ids += [item] * n_frames
                    fidx += list(range(n_frames))
                    rms_o += rms.tolist()
                    zcr_o += zc.tolist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(fidx, pa.int32()),
                    pa.array(np.asarray(rms_o, np.float32), pa.float32()),
                    pa.array(np.asarray(zcr_o, np.float32), pa.float32()),
                ],
                names=["item_id", "frame_idx", "rms", "zcr"],
            )

    aud = media_df.filter(media_df.modality == "audio").select("item_id", "payload")
    return aud.mapInArrow(_map, FRAMES_SCHEMA)
