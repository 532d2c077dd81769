"""Driver-style correctness check: run every oracled query on Spark AND
DuckDB at a given sf dir, sort columns by name, and compare row counts,
Arrow schema types, and (row-sorted) values. Mimics the per-round
CORRECTNESS_r{N}.json gate so oracle-dtype mismatches are caught locally.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(tbl: pa.Table) -> tuple[pd.DataFrame, dict[str, str]]:
    df = tbl.to_pandas()
    df = df[sorted(df.columns)]
    # plain integer widths hash identically through the driver's
    # normalization (round-1 evidence: embedding_topk's int32 rank vs
    # DuckDB's BIGINT ROW_NUMBER passed); HUGEINT (decimal128) does NOT
    types = {}
    for f in tbl.schema:
        t = str(f.type)
        types[f.name] = "int" if t in ("int8", "int16", "int32", "int64") else t
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df, types


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from tokseq.engine.session import get_spark
    from tokseq.queries import ORACLES, QUERIES

    only = set(sys.argv[2:])
    spark = get_spark(cores=8, shuffle_partitions=16, app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, sql in ORACLES.items():
        if only and name not in only:
            continue
        sdf = QUERIES[name](spark, sf_dir)
        s_tbl = pa.Table.from_pandas(sdf.toPandas(), preserve_index=False)
        o_tbl = con.execute(sql).arrow()
        s_df, s_types = _normalize(s_tbl)
        o_df, o_types = _normalize(o_tbl)
        rows_ok = len(s_df) == len(o_df)
        schema_ok = sorted(s_types) == sorted(o_types)
        type_diffs = {
            c: (s_types.get(c), o_types.get(c))
            for c in set(s_types) | set(o_types)
            if s_types.get(c) != o_types.get(c)
        }
        vals_ok = rows_ok and schema_ok and s_df.equals(o_df.astype(s_df.dtypes.to_dict()))
        status = "OK  " if (rows_ok and schema_ok and vals_ok and not type_diffs) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(s_df)}/{len(o_df)} "
            f"schema={'ok' if schema_ok and not type_diffs else type_diffs} "
            f"values={'ok' if vals_ok else 'MISMATCH'}"
        )
        if not vals_ok and rows_ok and not type_diffs:
            diff = (s_df != o_df).any(axis=1)
            print(s_df[diff].head(3))
            print(o_df[diff].head(3))
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
