"""Multimodal: REAL pure-numpy decode for netpbm (P5/P6) images and
PCM16 WAV audio, plus the Spark-side batch plumbing (schema, Arrow
path, determinism). Compressed formats (JPEG/PNG/MP3/MP4) raise
NotImplementedError naming the library to swap in — that stub
contract is itself under test."""

import numpy as np
import pytest

from tokseq.multimodal import (
    FEATURE_DIM,
    _decode_payload,
    _parse_pnm,
    _parse_wav,
    audio_frame_stats,
    decode_media,
    encode_pnm,
    encode_wav,
    extract_features,
    resize_images,
    resize_nn,
    synth_media_table,
)


# ---------------------------------------------------------------- decode


def test_pnm_p6_golden():
    """Hand-built 2x2 RGB P6 with a header comment decodes exactly."""
    raster = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])
    payload = b"P6\n# a comment\n2 2\n255\n" + raster
    px = _parse_pnm(payload)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[1, 1].tolist() == [9, 8, 7]


def test_pnm_p5_roundtrip():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    assert np.array_equal(_parse_pnm(encode_pnm(px)), px)


def test_pnm_p6_roundtrip():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    assert np.array_equal(_parse_pnm(encode_pnm(px)), px)


def test_wav_roundtrip_and_chunk_walk():
    rng = np.random.default_rng(5)
    s = rng.integers(-(1 << 15), 1 << 15, 777).astype("<i2")
    payload = encode_wav(s, 8000)
    out, sr = _parse_wav(payload)
    assert sr == 8000
    assert np.array_equal(out, s)
    # insert a LIST metadata chunk BEFORE data: the chunk walk must skip it
    import struct

    fmt_end = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    walked = payload[:fmt_end] + extra + payload[fmt_end:]
    out2, sr2 = _parse_wav(walked)
    assert sr2 == 8000 and np.array_equal(out2, s)


def test_wav_stereo_deinterleaves():
    rng = np.random.default_rng(6)
    s = rng.integers(-(1 << 15), 1 << 15, (300, 2)).astype("<i2")
    out, sr = _parse_wav(encode_wav(s, 44100))
    assert sr == 44100
    assert out.shape == (300, 2)
    assert np.array_equal(out, s)
    # mono fold averages channels — never mixes them sample-to-sample
    from tokseq.multimodal import _wav_mono

    mono = _wav_mono(encode_wav(s, 44100))
    assert np.allclose(mono, s.astype(np.float64).mean(axis=1))
    # features still well-formed on stereo
    f = _decode_payload(encode_wav(s, 44100), "audio")
    assert len(f) == FEATURE_DIM and all(0.0 <= v <= 1.0 for v in f)


def test_pnm_maxval_scaling():
    """maxval < 255 is legal netpbm (maxval = white): samples must be
    normalized to the 8-bit range, not read as near-black."""
    payload = b"P5\n2 1\n15\n" + bytes([15, 0])
    px = _parse_pnm(payload)
    assert px.tolist() == [[255, 0]]


def test_wav_streaming_data_size_clamps():
    """A pipe-written WAV marks an unknown data size with 0xFFFFFFFF:
    the parser clamps to the available bytes instead of raising."""
    import struct

    rng = np.random.default_rng(10)
    s = rng.integers(-1000, 1000, 48).astype("<i2")
    wav = bytearray(encode_wav(s, 16000))
    data_at = wav.index(b"data")
    struct.pack_into("<I", wav, data_at + 4, 0xFFFFFFFF)
    out, sr = _parse_wav(bytes(wav))
    assert sr == 16000
    assert np.array_equal(out, s)


def test_wav_truncation_raises_valueerror():
    """Truncated WAV payloads must raise ValueError (parser contract),
    never a raw struct.error — found by the malformed-input fuzz."""
    rng = np.random.default_rng(9)
    wav = encode_wav(rng.integers(-1000, 1000, 64).astype("<i2"), 8000)
    for cut in range(12, len(wav), 5):
        with pytest.raises(ValueError):
            _parse_wav(wav[:cut])


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        _decode_payload(b"NOTMAGIC123", "image")


def test_compressed_formats_raise_not_implemented():
    """The stub contract: recognized compressed magics name the
    missing library instead of failing cryptically."""
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_media(b"\xff\xd8\xff\xe0rest-of-jpeg", "image")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_media(b"\x89PNG\r\n\x1a\n....", "image")
    # MP4 ftyp box of ANY size, and MPEG-2 MP3 frame sync
    with pytest.raises(NotImplementedError, match="pyav"):
        decode_media(b"\x00\x00\x00\x20ftypisom....", "video")
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_media(b"\xff\xf3\x40\xc0frame-data", "audio")


def test_legacy_tsqm_blobs_still_decode():
    body = bytes(range(64))
    out = decode_media(b"TSQM" + body, "image")
    assert np.array_equal(out, np.frombuffer(body, np.uint8))


# ---------------------------------------------------------------- ops


def test_resize_nn_golden():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nn(px, 2, 2)
    # rows 0,2 and cols 0,2 survive
    assert np.array_equal(out, px[[0, 2]][:, [0, 2]])
    up = resize_nn(px, 8, 8)
    assert up.shape == (8, 8)
    assert np.array_equal(up[::2][:, ::2], px)  # exact upsample grid


def test_synth_deterministic_and_standard_formats():
    a, b = synth_media_table(32), synth_media_table(32)
    assert a.equals(b)
    pays = a["payload"].to_pylist()
    mods = a["modality"].to_pylist()
    for p, m in zip(pays, mods):
        if m == "image":
            assert p[:2] in (b"P5", b"P6")
            _parse_pnm(p)
        else:
            assert p[:4] == b"RIFF"
            _parse_wav(p)


def test_extract_features_spark(spark):
    table = synth_media_table(64)
    df = spark.createDataFrame(table.to_pandas())
    out = extract_features(df.repartition(4))
    rows = out.collect()
    assert len(rows) == 64
    by_id = {r["item_id"]: r for r in rows}
    assert set(by_id) == set(table["item_id"].to_pylist())
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # determinism + parity with the local decode
    local = _decode_payload(table["payload"][0].as_py(), "image")
    got = np.array(by_id["item-000000"]["feature"], dtype=np.float32)
    assert np.allclose(got, local)


def test_resize_images_spark(spark):
    table = synth_media_table(32)
    df = spark.createDataFrame(table.to_pandas())
    out = resize_images(df, 8, 6).collect()
    n_img = sum(1 for m in table["modality"].to_pylist() if m == "image")
    assert len(out) == n_img
    for r in out:
        assert (r["width"], r["height"]) == (8, 6)
        px = _parse_pnm(bytes(r["payload"]))
        assert px.shape[:2] == (6, 8)
    # value check against a local resize of the same item
    src = {i: p for i, p, m in zip(table["item_id"].to_pylist(),
                                   table["payload"].to_pylist(),
                                   table["modality"].to_pylist()) if m == "image"}
    r0 = next(r for r in out if r["item_id"] == "item-000000")
    expect = resize_nn(_parse_pnm(src["item-000000"]), 6, 8)
    assert np.array_equal(_parse_pnm(bytes(r0["payload"])), expect)


def test_avi_container_roundtrip():
    from tokseq.multimodal import _parse_avi_frames, encode_avi_mjpeg

    frames = [b"\xff\xd8\xff" + bytes([i]) * (i + 1) for i in range(7)]
    payload = encode_avi_mjpeg(frames, fps=24)
    out = _parse_avi_frames(payload)
    assert out == frames  # exact, odd sizes included (word-align pad)
    # decode of an AVI names the sampling alternative
    with pytest.raises(NotImplementedError, match="sample_video_frames"):
        decode_media(payload, "video")


def test_avi_multistream_and_truncation():
    import struct

    from tokseq.multimodal import _parse_avi_frames, encode_avi_mjpeg

    # interleave a second stream's chunks ('01dc') into movi: only
    # stream 00 frames come back, in order
    f0 = [b"\xff\xd8\xff" + bytes([i]) for i in range(4)]
    payload = encode_avi_mjpeg(f0)
    alien = b"01dc" + struct.pack("<I", 6) + b"other!"
    movi_at = payload.index(b"movi")
    # splice after the movi tag; grow the two enclosing size fields
    spliced = payload[: movi_at + 4] + alien + payload[movi_at + 4 :]
    spliced = bytearray(spliced)
    (riff_sz,) = struct.unpack_from("<I", spliced, 4)
    struct.pack_into("<I", spliced, 4, riff_sz + len(alien))
    (list_sz,) = struct.unpack_from("<I", spliced, movi_at - 4)
    struct.pack_into("<I", spliced, movi_at - 4, list_sz + len(alien))
    assert _parse_avi_frames(bytes(spliced)) == f0
    # truncated container raises instead of returning a short frame
    with pytest.raises(ValueError, match="truncated"):
        _parse_avi_frames(payload[:-3])
    # dc-suffixed chunk OUTSIDE movi is ignored (not a frame)
    stray = b"00dc" + struct.pack("<I", 4) + b"nope"
    with_stray = bytearray(payload + stray)
    struct.pack_into("<I", with_stray, 4, riff_sz + len(stray))
    assert _parse_avi_frames(bytes(with_stray)) == f0


def test_pnm_maxval_rounds_to_nearest():
    # 100/200 is exactly half: rounds to 128, not floor's 127
    payload = b"P5\n3 1\n200\n" + bytes([100, 200, 199])
    assert _parse_pnm(payload).tolist() == [[128, 255, 254]]


def test_sample_video_frames_spark(spark):
    from tokseq.multimodal import (
        _parse_avi_frames,
        sample_video_frames,
        synth_video_table,
    )

    table = synth_video_table(12)
    df = spark.createDataFrame(table.to_pandas())
    rows = sample_video_frames(df, every_k=3).collect()
    expect = {
        i: len(range(0, n, 3))
        for i, n in zip(table["item_id"].to_pylist(), table["n_frames"].to_pylist())
    }
    got = {}
    for r in rows:
        got[r["item_id"]] = got.get(r["item_id"], 0) + 1
        assert r["frame_idx"] % 3 == 0
        assert bytes(r["frame"])[:4] == b"\xff\xd8\xff\xe0"
        assert r["frame_bytes"] == len(bytes(r["frame"]))
    assert got == expect
    # value check: frame 0 of item 0 matches a local container walk
    local0 = _parse_avi_frames(table["payload"][0].as_py())[0]
    r0 = next(r for r in rows if r["item_id"] == "vid-000000" and r["frame_idx"] == 0)
    assert bytes(r0["frame"]) == local0


def test_audio_frame_stats_spark(spark):
    table = synth_media_table(32)
    df = spark.createDataFrame(table.to_pandas())
    frame, hop = 128, 64
    rows = audio_frame_stats(df, frame=frame, hop=hop).collect()
    # expected frame count per audio item
    expect = {}
    for i, p, m in zip(table["item_id"].to_pylist(),
                       table["payload"].to_pylist(),
                       table["modality"].to_pylist()):
        if m != "audio":
            continue
        n = len(_parse_wav(p)[0])
        expect[i] = max(0, (n - frame) // hop + 1) if n >= frame else 0
    got = {}
    for r in rows:
        got[r["item_id"]] = got.get(r["item_id"], 0) + 1
        assert 0.0 <= r["rms"] <= 1.0
        assert 0.0 <= r["zcr"] <= 1.0
    assert got == {k: v for k, v in expect.items() if v}
    # one value check: frame 0 RMS of the first audio item
    p0 = next(p for p, m in zip(table["payload"].to_pylist(),
                                table["modality"].to_pylist()) if m == "audio")
    s = _parse_wav(p0)[0].astype(np.float64)[:frame]
    want = np.sqrt((s * s).mean()) / 32768.0
    r0 = next(r for r in rows if r["item_id"] == "item-000001" and r["frame_idx"] == 0)
    assert abs(r0["rms"] - want) < 1e-6


def test_malformed_headers_raise_clean_errors():
    """ADVICE r4 hardening: negative pnm dims, short rasters, odd WAV
    data, and deeply nested AVI LISTs all raise clean ValueErrors
    (never a leaked numpy shape error or executor RecursionError)."""
    import struct

    from tokseq.multimodal import _parse_avi_frame_spans, _parse_wav

    # negative/zero dimensions must not flow into frombuffer(count<0)
    for hdr in (b"P5\n-4 4\n255\n", b"P5\n4 -4\n255\n", b"P6\n0 3\n255\n"):
        with pytest.raises(ValueError, match="dimensions"):
            _parse_pnm(hdr + b"\x00" * 64)
    # raster shorter than w*h*ch: explicit message, not numpy's
    with pytest.raises(ValueError, match="truncated netpbm raster"):
        _parse_pnm(b"P6\n10 10\n255\n" + b"\x00" * 10)

    # odd-length PCM16 data chunk: clean error, not numpy's
    # "buffer size must be a multiple of element size"
    data = b"\x01\x02\x03"
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data + b"\x00")
    wav_odd = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    with pytest.raises(ValueError, match="odd byte count"):
        _parse_wav(wav_odd)

    # ~2000 nested LIST headers: the iterative walk returns normally
    inner = b""
    for _ in range(2000):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"xxxx" + inner
    body = b"AVI " + inner
    deep = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _parse_avi_frame_spans(deep) == []


def test_avi_iterative_walk_preserves_frame_order():
    """Frames before/inside/after a nested LIST keep document order
    through the stack-based walk."""
    import struct

    from tokseq.multimodal import _parse_avi_frame_spans

    f = lambda b: b"00dc" + struct.pack("<I", len(b)) + b
    rec = b"LIST" + struct.pack("<I", len(f(b"f2__")) + 4) + b"rec " + f(b"f2__")
    movi_body = f(b"f1__") + rec + f(b"f3__")
    movi = b"LIST" + struct.pack("<I", len(movi_body) + 4) + b"movi" + movi_body
    body = b"AVI " + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    got = [avi[o:o + s] for o, s in _parse_avi_frame_spans(avi)]
    assert got == [b"f1__", b"f2__", b"f3__"]


def test_frozen_media_fixtures_in_sync():
    """The committed fixtures (fixtures/media_*.parquet, the oracle
    side of multimodal_features/multimodal_frames) must match what the
    freeze script would produce from the current kernels — a kernel
    change without regeneration fails HERE, not as a confusing driver
    hash mismatch."""
    import importlib
    import sys
    from pathlib import Path

    import pyarrow.parquet as pq

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "scripts"))
    try:
        freeze = importlib.import_module("freeze_media_fixtures")
    finally:
        sys.path.pop(0)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        orig = freeze.FIXDIR
        freeze.FIXDIR = Path(d)
        try:
            freeze.main()
        finally:
            freeze.FIXDIR = orig
        for name in (
            "media_features.parquet",
            "media_resize.parquet",
            "media_audio_frames.parquet",
            "media_video_frames.parquet",
        ):
            fresh = pq.read_table(Path(d) / name)
            frozen = pq.read_table(repo / "fixtures" / name)
            assert fresh.equals(frozen), f"{name} drifted — rerun " \
                "scripts/freeze_media_fixtures.py and re-verify the oracles"
