"""Multimodal plumbing: schema, Arrow batch path, determinism.
The media decode itself is a documented stub (libs not in container);
what's under test is the production Spark-side path."""

import numpy as np
import pytest

from tokseq.multimodal import (
    FEATURE_DIM,
    _decode_payload,
    extract_features,
    synth_media_table,
)


def test_synth_deterministic():
    a, b = synth_media_table(32), synth_media_table(32)
    assert a.equals(b)


def test_decode_stub_rejects_garbage():
    with pytest.raises(ValueError):
        _decode_payload(b"NOTMAGIC123", "image")


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
    # determinism + parity with the local stub
    local = _decode_payload(table["payload"][0].as_py(), "image")
    got = np.array(by_id["item-000000"]["feature"], dtype=np.float32)
    assert np.allclose(got, local)
