"""ANN quality: the LSH- and IVF-bucketed searches must be
deterministic and recall most of the brute-force neighbors."""

import tokseq.queries as Q

SF = "/root/testdata/sf0.01"


def _topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    return {q: [v for _, v in sorted(vs)] for q, vs in out.items()}


def test_ivf_deterministic_and_recalls(spark):
    brute = _topk_map(Q.QUERIES["embedding_topk"](spark, SF))
    ivf1 = _topk_map(Q.QUERIES["embedding_ivf_topk"](spark, SF))
    ivf2 = _topk_map(Q.QUERIES["embedding_ivf_topk"](spark, SF))
    assert ivf1 == ivf2  # deterministic
    assert len(ivf1) == 8
    # top-1 recall vs brute force over the 8 queries
    hits = sum(1 for q in brute if ivf1.get(q) and brute[q][0] in ivf1[q])
    assert hits >= 4, f"IVF recall too low: {hits}/8"


def test_lsh_recalls(spark):
    brute = _topk_map(Q.QUERIES["embedding_topk"](spark, SF))
    lsh = _topk_map(Q.QUERIES["embedding_ann_lsh"](spark, SF))
    hits = sum(1 for q in brute if lsh.get(q) and brute[q][0] in lsh[q])
    assert hits >= 2, f"LSH recall too low: {hits}/8"


def test_lsh_geometry_scales_with_n(spark, tmp_path):
    """bits/table derives from N (clamped log2(N/target)): parity with
    the DuckDB oracle must hold at a second N with DIFFERENT derived
    bits, and bucket ids must stay inside the derived range."""
    import os

    import duckdb
    import numpy as np
    from tokseq.queries import ORACLE_LSH_ASSIGN, _lsh_bits

    assert _lsh_bits(500) == 5
    assert _lsh_bits(3000) == 8
    assert _lsh_bits(10) == 4          # clamp floor
    assert _lsh_bits(10**9) == 12      # clamp ceiling

    n = 3000
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, 64)).astype(np.float32)
    import pandas as pd
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [v for v in vecs]})
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(pdf).write.parquet(os.path.join(sf, "embeddings.parquet"))

    got = Q.QUERIES["lsh_bucket_assign"](spark, sf)
    rows = {(r.vec_id, r.tbl, r.bucket) for r in got.collect()}
    assert len(rows) == 4 * n
    assert max(b for _, _, b in rows) < (1 << 8)
    assert max(b for _, _, b in rows) >= (1 << 7)  # 8 bits actually used

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    want = {tuple(r) for r in con.execute(ORACLE_LSH_ASSIGN).fetchall()}
    assert rows == want
