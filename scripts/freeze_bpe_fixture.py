#!/usr/bin/env python
"""Freeze the expected BPE merge table for sf0.01 into
fixtures/bpe_merges_sf001.parquet, computed by an INDEPENDENT
pure-Python BPE (DuckDB tokenization + Counter-based pair counting —
no Spark, no tokseq kernels), so the driver's hash check compares the
distributed learner against a genuinely separate implementation.

The fixture pins the sf0.01 testdata (the driver's correctness scale);
regenerate if the testdata or the tokenization recipe changes:

    python scripts/freeze_bpe_fixture.py
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

# deliberately NO tokseq import (and no sys.path hack): this script's
# value as an oracle is its independence from the code under test

FIXDIR = Path(__file__).resolve().parent.parent / "fixtures"
SF_DIR = "/root/testdata/sf0.01"
N_MERGES = 8
VOCAB_BASE = 50257


def tokenize_duckdb(sf_dir: str) -> list[list[int]]:
    """Same md5-prefix tokenization as tokenize_documents_md5 /
    ORACLE_ROUNDTRIP_AGG, computed entirely in DuckDB."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT doc_id, list(tok ORDER BY pos) AS toks
        FROM (
          SELECT doc_id,
                 generate_subscripts(string_split(text, ' '), 1) AS pos,
                 ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 8))::BIGINT
                   % 50257 AS tok
          FROM read_parquet('{sf_dir}/documents.parquet')
        ) GROUP BY doc_id ORDER BY doc_id
        """
    ).fetchall()
    return [[int(t) for t in r[1]] for r in rows]


def ref_merge(tokens: list[int], a: int, b: int, new_id: int) -> list[int]:
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def main() -> None:
    docs = tokenize_duckdb(SF_DIR)
    merges = []
    for r in range(N_MERGES):
        c: Counter = Counter()
        for d in docs:
            for i in range(len(d) - 1):
                c[(d[i], d[i + 1])] += 1
        if not c:
            break
        (t1, t2), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        new_id = VOCAB_BASE + r
        merges.append((r, t1, t2, new_id, n))
        docs = [ref_merge(d, t1, t2, new_id) for d in docs]
    FIXDIR.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "round": pa.array([m[0] for m in merges], pa.int32()),
                "t1": pa.array([m[1] for m in merges], pa.int32()),
                "t2": pa.array([m[2] for m in merges], pa.int32()),
                "new_id": pa.array([m[3] for m in merges], pa.int32()),
                "n": pa.array([m[4] for m in merges], pa.int64()),
            }
        ),
        FIXDIR / "bpe_merges_sf001.parquet",
    )
    for m in merges:
        print(m)


if __name__ == "__main__":
    main()
