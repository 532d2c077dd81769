#!/usr/bin/env python
"""Interleaved A/B benchmark: HEAD vs a baseline git rev, same session.

Cross-round wall-clock comparisons on this shared host are meaningless
(2-3x noise between noise epochs — see BENCH/BASELINE.md), so any
"r3 is faster than r2" claim must come from ALTERNATING runs inside one
session: A, B, A, B, ... with best-of-N per arm. This script checks the
baseline rev out into a git worktree under /tmp, reuses the SAME cached
corpus parquet for both arms, and drives each arm's own bench.py child
(subprocess per measurement, one JVM per Spark master) in strict
alternation.

Usage: python scripts/ab_bench.py [--rev <baseline-rev>] [--reps 3]
                                  [--cores 32] [--scale <corpus scale>]
Prints one JSON line and writes BENCH/AB_<revA>_vs_HEAD.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WALL_KEYS = ("encode_sec", "encode_df_route_sec", "encode_write_sec",
             "decode_sec", "decode_kernel_sec")


def ensure_worktree(rev: str) -> Path:
    short = subprocess.run(
        ["git", "rev-parse", "--short", rev], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = Path(f"/tmp/tokseq_ab_{short}")
    if not (wt / "bench.py").exists():
        subprocess.run(["git", "worktree", "prune"], cwd=REPO, check=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(wt), rev],
            cwd=REPO, check=True,
        )
    return wt


def run_arm(bench_dir: Path, cores: int, corpus: str) -> dict:
    fd, out = tempfile.mkstemp(suffix=".json")
    os.close(fd)
    try:
        cmd = [
            sys.executable, str(bench_dir / "bench.py"), "--child",
            "--cores", str(cores), "--corpus", corpus,
            "--out-json", out, "--write",
        ]
        subprocess.run(cmd, check=True, cwd=bench_dir,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(out) as f:
            return json.load(f)
    finally:
        try:
            os.unlink(out)
        except OSError:
            pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", default=None,
                    help="baseline rev (default: last round-N tag/commit)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--scale", type=float, default=None)
    args = ap.parse_args()

    rev = args.rev
    if rev is None:
        # default baseline: the round-2 driver commit
        rev = subprocess.run(
            ["git", "log", "--format=%H %s"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout
        try:
            rev = next(
                line.split()[0]
                for line in rev.splitlines()
                if "round 2:" in line
            )
        except StopIteration:
            sys.exit(
                "ab_bench: no 'round 2:' commit found in history; "
                "pass an explicit baseline with --rev <commit>"
            )

    import bench  # HEAD's bench module, for corpus generation only

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale = args.scale if args.scale is not None else bench.SCALE_PER_SF * bench.sf_of(sf_dir)
    corpus = bench.ensure_corpus(scale)
    wt = ensure_worktree(rev)
    short = subprocess.run(
        ["git", "rev-parse", "--short", rev], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    arms = {"baseline": wt, "head": REPO}
    runs: dict[str, list[dict]] = {k: [] for k in arms}
    for rep in range(args.reps):
        for name, d in arms.items():  # strict alternation inside each rep
            t0 = time.time()
            m = run_arm(d, args.cores, corpus)
            runs[name].append(m)
            print(
                f"# rep {rep + 1}/{args.reps} {name:8s} "
                + " ".join(
                    f"{k.replace('_sec', '')}={m.get(k, float('nan')):.2f}s"
                    for k in WALL_KEYS
                ),
                file=sys.stderr,
            )
            del t0

    def best(name: str, key: str) -> float:
        vals = [m[key] for m in runs[name] if key in m]
        return min(vals) if vals else float("nan")

    def paired(key: str) -> dict:
        """Per-rep baseline/head ratios (the two runs of a rep are
        adjacent in time, so each ratio sees roughly one host-noise
        window) + their geometric mean — the right summary under the
        multiplicative noise this host exhibits."""
        ratios = [
            b[key] / h[key]
            for b, h in zip(runs["baseline"], runs["head"])
            if key in b and key in h and h[key]
        ]
        g = 1.0
        for r in ratios:
            g *= r
        return {
            "per_rep": [round(r, 3) for r in ratios],
            "geomean": round(g ** (1 / len(ratios)), 3) if ratios else None,
        }

    payload = {
        "metric": "ab_interleaved_walls_local%d" % args.cores,
        "baseline_rev": short,
        "reps": args.reps,
        "cores": args.cores,
        "corpus_scale": scale,
        "tokens": runs["head"][0]["tokens"],
        "walls_best_of": {
            key: {
                "baseline": round(best("baseline", key), 3),
                "head": round(best("head", key), 3),
                "speedup": round(best("baseline", key) / best("head", key), 3),
            }
            for key in WALL_KEYS
        },
        "paired_speedups": {key: paired(key) for key in WALL_KEYS},
        "bytes_per_token": {
            "baseline": round(
                runs["baseline"][0]["out_bytes"] / runs["baseline"][0]["tokens"], 4
            ),
            "head": round(runs["head"][0]["out_bytes"] / runs["head"][0]["tokens"], 4),
        },
    }

    report = REPO / "BENCH" / f"AB_{short}_vs_HEAD.md"
    with open(report, "w") as f:
        f.write(
            f"""# Interleaved A/B — baseline {short} vs HEAD
(measured {time.strftime('%Y-%m-%d %H:%M:%S')}, local[{args.cores}],
{args.reps} alternating reps per arm, best-of per wall, SAME corpus
file, one session — the only wall comparison that is valid on this
noisy shared host.)

| wall | baseline {short} (s) | HEAD (s) | speedup |
|---|---|---|---|
"""
        )
        for key, row in payload["walls_best_of"].items():
            pr = payload["paired_speedups"][key]
            f.write(
                f"| {key.replace('_sec', '')} | {row['baseline']} | "
                f"{row['head']} | {row['speedup']}x (paired geomean "
                f"{pr['geomean']}x over {pr['per_rep']}) |\n"
            )
        f.write(
            f"\nbytes/token: baseline {payload['bytes_per_token']['baseline']}"
            f" -> HEAD {payload['bytes_per_token']['head']}\n"
        )
    # machine-readable copy for bench.py to embed as ab_vs_prev in the
    # round's BENCH_r*.json (VERDICT r5 What's-wrong #2: the valid
    # cross-round comparison should live IN the artifact, not need
    # manual adjudication from a side file)
    payload["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(REPO / "BENCH" / "ab_latest.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
