"""Interleaved quiet-box A/B of one registered query between two checkouts
— the protocol that settled pipeline_linkage in round 7 (VERDICT r6 #7):
alternating A/B/A/B/... runs so box-wide drift hits both sides equally,
each run a hermetic subprocess (fresh JVM + SparkSession, generic warmup,
min of K timed runs with clearCache between), and the single-core
calibration microbench stamped before/after every run pair so a steal
episode is visible in the record instead of silently deciding it.

Usage:
  python tools/ab_interleaved.py QUERY DIR_A DIR_B [--pairs 3] [--runs 2] \
      [--sf /root/testdata/sf0.1] [--cpus 32]

DIR_A / DIR_B are repo roots (e.g. the live repo and a `git worktree` of an
older round's commit). Prints one JSON line per run plus a final summary
line with per-side medians, the ratio, and the calibration series.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from entity_linkings_spark import get_spark
import __spark_entry__ as entrymod
from pyspark.sql import functions as F

sf_dir, cpus, name, nruns = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
spark = get_spark(app_name=f"ab-{name}", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, 5_000_000, 1, 64).agg(F.sum("id")).collect()
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
q = entrymod.queries()[name]
runs, rows = [], None
for _ in range(nruns):
    t0 = time.time()
    rows = q(spark, sf_dir).count()
    runs.append(round(time.time() - t0, 3))
    spark.catalog.clearCache()
print(json.dumps({"runs": runs, "sec": min(runs), "rows": rows}))
spark.stop()
"""


def _calibrate() -> float:
    import numpy as np

    def once() -> float:
        rng = np.random.RandomState(42)
        a = rng.randint(0, 255, size=(2048, 2048)).astype(np.uint16)
        t0 = time.perf_counter()
        sink = 0
        for _ in range(250):
            b = np.minimum(a + 3, a[:, ::-1] * 2)
            sink += int(b[::97, ::97].sum())
        assert sink > 0
        return time.perf_counter() - t0

    time.sleep(1.0)
    return round(min(once(), once()), 3)


def _run(repo: str, query: str, sf: str, cpus: int, nruns: int) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", _SNIPPET, sf, str(cpus), query, str(nruns)],
        capture_output=True, text=True, timeout=1800, cwd=repo,
    )
    lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
    if res.returncode != 0 or not lines:
        raise RuntimeError(f"A/B run in {repo} failed:\n{res.stderr[-3000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    secs = {"A": [], "B": []}
    cals = [_calibrate()]
    for i in range(args.pairs):
        # alternate which side goes first so a monotone drift cancels
        order = ("A", "B") if i % 2 == 0 else ("B", "A")
        for side in order:
            repo = args.dir_a if side == "A" else args.dir_b
            out = _run(repo, args.query, args.sf, args.cpus, args.runs)
            secs[side].append(out["sec"])
            print(json.dumps({"pair": i, "side": side, "repo": repo, **out}))
        cals.append(_calibrate())

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)

    summary = {
        "query": args.query,
        "A": {"dir": args.dir_a, "secs": secs["A"], "median": med(secs["A"])},
        "B": {"dir": args.dir_b, "secs": secs["B"], "median": med(secs["B"])},
        "ratio_A_over_B": round(med(secs["A"]) / med(secs["B"]), 4),
        "calibration_sec": cals,
        "cal_spread": round(max(cals) / min(cals), 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
