"""Deterministic synthetic tokenized-sequence corpus (FIXTURES.md F1/F2).

Schema (BASELINE.json input_hint):
    doc_id  string        f"{source}-{i:08d}"
    tokens  array<int32>  values in [0, 2^31)
    n_tok   int32
    source  string        generation regime; every codec has a natural winner

All generation is seeded (seed=42 default) and fully vectorized —
lengths and the flat token stream are drawn in one numpy call per
source, then split by offsets. The reference's test generator is
unseeded (/root/reference/src/packed_seq.rs:1362-1374); ours must be
deterministic (FIXTURES.md preamble), so we do NOT copy that.

Sources (FIXTURES.md F1):
    uniform2b    vocab 4, len U(0,128)   — random-DNA analog; 2-bit bitpack
    uniform4b    vocab 16, len U(0,1024) — 4-bit bitpack
    lowcard      <=30 distinct/doc       — dict
    runs         geometric runs, mean 32 — rle
    narrowrange  [1e6, 1e6+500)          — frame-of-reference
    textish      zipf over 50257         — fsst
    heavytail    lognormal lengths, zipf — skew / chunking / salting
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

VOCAB_TEXT = 50257
DEFAULT_SEED = 42


def _zipf_tokens(rng: np.random.Generator, n: int, vocab: int) -> np.ndarray:
    """Zipf-like token ids via log-uniform ranks (p(r) ~ 1/r): frequent
    small ids, long tail — the text-token regime. ~10x faster than
    rng.zipf at bench scales."""
    u = rng.random(n)
    r = np.exp(u * np.log(vocab)).astype(np.int64) - 1
    return np.minimum(r, vocab - 1)


def _source_uniform2b(rng, n_docs):
    lens = rng.integers(0, 129, n_docs)
    vals = rng.integers(0, 4, int(lens.sum()))
    return lens, vals


def _source_uniform4b(rng, n_docs):
    lens = rng.integers(0, 1025, n_docs)
    vals = rng.integers(0, 16, int(lens.sum()))
    return lens, vals


def _source_lowcard(rng, n_docs):
    lens = rng.integers(100, 5001, n_docs)
    total = int(lens.sum())
    doc_of = np.repeat(np.arange(n_docs), lens)
    dicts = rng.integers(0, 1000, (n_docs, 30))
    rank = (rng.geometric(0.2, total) - 1) % 30
    return lens, dicts[doc_of, rank]


def _source_runs(rng, n_docs):
    lens = rng.integers(100, 5001, n_docs)
    total = int(lens.sum())
    est_runs = max(8, int(total / 32 * 1.5))
    run_vals = rng.integers(0, 256, est_runs)
    run_lens = rng.geometric(1.0 / 32, est_runs)
    while int(run_lens.sum()) < total:
        run_vals = np.concatenate([run_vals, rng.integers(0, 256, est_runs)])
        run_lens = np.concatenate([run_lens, rng.geometric(1.0 / 32, est_runs)])
    flat = np.repeat(run_vals, run_lens)[:total]
    return lens, flat


def _source_narrowrange(rng, n_docs):
    lens = rng.integers(100, 5001, n_docs)
    vals = 1_000_000 + rng.integers(0, 500, int(lens.sum()))
    return lens, vals


def _source_textish(rng, n_docs):
    lens = rng.integers(50, 2001, n_docs)
    return lens, _zipf_tokens(rng, int(lens.sum()), VOCAB_TEXT)


def _source_phrases(rng, n_docs):
    """Documents stitched from a 400-phrase bank (8..32 tokens each,
    16-bit values): high token-level cardinality (dict loses), no runs
    (rle loses), near-uniform bit widths (split ~= bitpack) — but long
    REPEATED byte-grams, the regime the FSST-style codec exists for."""
    lens = rng.integers(200, 3000, n_docs)
    total = int(lens.sum())
    n_bank = 100
    bank = [rng.integers(0, 1 << 16, int(rng.integers(8, 33))) for _ in range(n_bank)]
    bank_vals = np.concatenate(bank)
    bank_len = np.array([len(b) for b in bank])
    bank_off = np.concatenate(([0], np.cumsum(bank_len)))[:-1]
    n_draws = total // 8 + n_docs + 1

    def _draw(k):
        # zipf-ish phrase popularity (log-uniform rank): a few phrases
        # dominate, as in natural text
        return np.minimum(
            np.exp(rng.random(k) * np.log(n_bank)).astype(np.int64) - 1, n_bank - 1
        )

    ids = _draw(n_draws)
    while int(bank_len[ids].sum()) < total:
        ids = np.concatenate([ids, _draw(n_draws)])
    lens_per = bank_len[ids]
    out_off = np.concatenate(([0], np.cumsum(lens_per)))[:-1]
    m = int(lens_per.sum())
    idx = (
        np.arange(m, dtype=np.int64)
        - np.repeat(out_off, lens_per)
        + np.repeat(bank_off[ids], lens_per)
    )
    return lens, bank_vals[idx][:total]


def _source_heavytail(rng, n_docs, giant_doc_tokens: int = 0):
    lens = np.minimum(rng.lognormal(5.5, 2.0, n_docs), 2_000_000).astype(np.int64)
    if giant_doc_tokens and n_docs:
        lens[0] = giant_doc_tokens
    return lens, _zipf_tokens(rng, int(lens.sum()), VOCAB_TEXT)


_SOURCES = {
    "uniform2b": _source_uniform2b,
    "uniform4b": _source_uniform4b,
    "lowcard": _source_lowcard,
    "runs": _source_runs,
    "narrowrange": _source_narrowrange,
    "textish": _source_textish,
    "phrases": _source_phrases,
    "heavytail": _source_heavytail,
}

# doc counts at scale=1.0
_BASE_COUNTS = {
    "uniform2b": 400,
    "uniform4b": 200,
    "lowcard": 150,
    "runs": 150,
    "narrowrange": 150,
    "textish": 300,
    "phrases": 150,
    "heavytail": 60,
}


def _boundary_docs(chunk_width: int = 4096):
    """FIXTURES.md F2 boundary rows, as (name, values) pairs."""
    docs = []
    for i in range(8):
        docs.append((f"empty-{i}", np.zeros(0, np.int64)))
    for ln in range(1, 129):
        docs.append((f"len{ln:03d}", (np.arange(ln) % 4).astype(np.int64)))
    for i in range(4):
        docs.append((f"single-{i}", np.array([i * 7 % 4], np.int64)))
    for w in (2, 4, 8, 16, 31):
        docs.append((f"sat-w{w}", np.full(100, (1 << w) - 1, np.int64)))
    for i in range(4):
        docs.append((f"zeros-{i}", np.zeros(50 + i, np.int64)))
    for d in (-1, 0, 1):
        for rep in range(2):
            ln = chunk_width + d
            docs.append((f"chunkedge{d:+d}-{rep}", (np.arange(ln) % 7).astype(np.int64)))
    for i in range(4):
        docs.append((f"const-{i}", np.full(5000, 42 + i, np.int64)))
    rng = np.random.default_rng(DEFAULT_SEED + 999)
    for i in range(8):
        v = 1_000_000 + rng.integers(0, 64, 3000)
        exc = rng.choice(3000, 30, replace=False)
        v[exc] = rng.integers(0, 1 << 30, 30)
        docs.append((f"exc1pct-{i}", v.astype(np.int64)))
    return docs


def generate_corpus(
    scale: float = 1.0,
    seed: int = DEFAULT_SEED,
    include_boundary: bool = True,
    chunk_width: int = 4096,
    giant_doc_tokens: int = 0,
) -> pa.Table:
    """Build the corpus as an Arrow table (list<int32> tokens)."""
    doc_ids: list[np.ndarray] = []
    sources: list[np.ndarray] = []
    all_lens: list[np.ndarray] = []
    all_vals: list[np.ndarray] = []

    for name, fn in _SOURCES.items():
        # zlib.crc32 is a stable hash (builtin hash() is salted per process)
        rng = np.random.default_rng((seed, zlib.crc32(name.encode())))
        n_docs = max(1, int(_BASE_COUNTS[name] * scale))
        if name == "heavytail":
            lens, vals = fn(rng, n_docs, giant_doc_tokens)
        else:
            lens, vals = fn(rng, n_docs)
        ids = np.array([f"{name}-{i:08d}" for i in range(n_docs)])
        doc_ids.append(ids)
        sources.append(np.full(n_docs, name))
        all_lens.append(lens.astype(np.int64))
        all_vals.append(np.asarray(vals, dtype=np.int64))

    if include_boundary:
        bdocs = _boundary_docs(chunk_width)
        ids = np.array([f"boundary-{n}" for n, _ in bdocs])
        doc_ids.append(ids)
        sources.append(np.full(len(bdocs), "boundary"))
        all_lens.append(np.array([len(v) for _, v in bdocs], np.int64))
        all_vals.append(
            np.concatenate([v for _, v in bdocs]) if bdocs else np.zeros(0, np.int64)
        )

    lens = np.concatenate(all_lens)
    vals = np.concatenate(all_vals).astype(np.int32)
    # list<int32> (Spark-friendly) carries 32-bit offsets, so ONE array
    # cannot hold >= 2^31 values — a 16x weak-scaling corpus (3.7B
    # tokens) must be built as a CHUNKED list column, each chunk under
    # the offset budget (slices of `vals` are zero-copy)
    cum = np.concatenate(([0], np.cumsum(lens)))
    budget = 2**31 - 2**20
    pieces = []
    r0, n_rows = 0, len(lens)
    while r0 < n_rows:
        r1 = int(np.searchsorted(cum, cum[r0] + budget, side="right")) - 1
        r1 = min(max(r1, r0 + 1), n_rows)
        offs = (cum[r0 : r1 + 1] - cum[r0]).astype(np.int32)
        pieces.append(
            pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                pa.array(vals[cum[r0] : cum[r1]], pa.int32()),
            )
        )
        r0 = r1
    tokens = pa.chunked_array(pieces, pa.list_(pa.int32()))
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(doc_ids), pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32), pa.int32()),
            "source": pa.array(np.concatenate(sources), pa.string()),
        }
    )


def write_corpus(path: str, scale: float = 1.0, seed: int = DEFAULT_SEED,
                 include_boundary: bool = True, chunk_width: int = 4096,
                 giant_doc_tokens: int = 0, row_group_size: int = 4096,
                 rows_per_file: int = 4096) -> str:
    """Write the corpus as a DIRECTORY of part files (like any real
    corpus landing zone) so Spark's scan fans out across cores even
    locally."""
    import os

    import pyarrow.parquet as pq

    table = generate_corpus(scale, seed, include_boundary, chunk_width, giant_doc_tokens)
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    nfiles = max(1, (n + rows_per_file - 1) // rows_per_file)
    for i in range(nfiles):
        part = table.slice(i * rows_per_file, rows_per_file)
        pq.write_table(
            part,
            os.path.join(path, f"part-{i:05d}.parquet"),
            row_group_size=row_group_size,
        )
    return path
