"""Round-9 optimization measurement harness (bench.py is FROZEN — this file
holds the extra instrumentation the optimization guide §1 asks for).

Modes:
  python bench_extra.py time Q1 [Q2 ...] [--runs 2] [--noop]
      Hermetic per-query timing, same protocol as bench.py (own subprocess,
      generic warmup, min of N runs with clearCache between). --noop times a
      noop-sink write of every column instead of .count() (guide §1.4).
  python bench_extra.py explain Q1 [Q2 ...] [--out plans/r09 --suffix before]
      Capture .explain("formatted") per query into <out>/<q>_<suffix>.txt.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

_TIME_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from entity_linkings_spark import get_spark
import __spark_entry__ as entrymod
from pyspark.sql import functions as F

sf_dir, cpus, name, nruns, sink = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]), sys.argv[5])
spark = get_spark(app_name=f"elx-{name}", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, 5_000_000, 1, 64).agg(F.sum("id")).collect()
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
from entity_linkings_spark.driver_queries import QUERIES as _all
q = entrymod.queries().get(name) or _all[name]
spark.sparkContext.setJobDescription(f"bench_extra:{name}")
runs, rows = [], None
for _ in range(nruns):
    t0 = time.time()
    df = q(spark, sf_dir)
    if sink == "noop":
        df.write.format("noop").mode("overwrite").save()
        rows = -1
    else:
        rows = df.count()
    runs.append(round(time.time() - t0, 3))
    spark.catalog.clearCache()
print(json.dumps({"name": name, "runs": runs, "sec": min(runs), "rows": rows}))
spark.stop()
"""

_EXPLAIN_SNIPPET = r"""
import io, json, os, sys
from contextlib import redirect_stdout
sys.path.insert(0, os.getcwd())
from entity_linkings_spark import get_spark
import __spark_entry__ as entrymod

sf_dir, cpus, name, out_path = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
spark = get_spark(app_name=f"elx-explain-{name}", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
from entity_linkings_spark.driver_queries import QUERIES as _all
q = entrymod.queries().get(name) or _all[name]
df = q(spark, sf_dir)
buf = io.StringIO()
with redirect_stdout(buf):
    df.explain("formatted")
with open(out_path, "w") as f:
    f.write(buf.getvalue())
print(json.dumps({"name": name, "out": out_path, "bytes": len(buf.getvalue())}))
spark.stop()
"""


def _run(snippet: str, argv: list[str]) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", snippet, *argv],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
    if res.returncode != 0 or not lines:
        raise RuntimeError(
            f"subprocess failed (exit {res.returncode}):\n{res.stderr[-4000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "explain"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r09"))
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    if args.mode == "time":
        total = 0.0
        for name in args.queries:
            out = _run(_TIME_SNIPPET, [
                SF_DIR, CPUS, name, str(args.runs),
                "noop" if args.noop else "count"])
            total += out["sec"]
            print(json.dumps(out))
        print(json.dumps({"total_sec": round(total, 3)}))
    else:
        os.makedirs(args.out, exist_ok=True)
        for name in args.queries:
            path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
            print(json.dumps(_run(_EXPLAIN_SNIPPET, [SF_DIR, CPUS, name, path])))


if __name__ == "__main__":
    main()
