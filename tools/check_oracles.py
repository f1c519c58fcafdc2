"""Local replica of the driver's correctness gate: run each registered query
on Spark AND its oracle SQL on DuckDB at sf0.01, compare row count, schema
(sorted column names) and an order-insensitive value hash.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        import numpy as _np
        if isinstance(v, _np.ndarray):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = sorted("|".join(cell(v) for v in r) for r in df.itertuples(index=False, name=None))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as entry
    from entity_linkings_spark import get_spark

    QUERIES, ORACLES = entry.queries(), entry.oracle_sql()
    # retired-from-registry names (the folded J5/ANN/simhash variants) stay
    # benchable and keep their oracles in driver_queries — make them
    # checkable here too (r9: the optimization round touches their plans)
    from entity_linkings_spark import driver_queries as _dq

    for n, fn in _dq.QUERIES.items():
        QUERIES.setdefault(n, fn)
    for n, sql in _dq.ORACLES.items():
        ORACLES.setdefault(n, sql)

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    names = sys.argv[1:] or list(QUERIES)
    failures = 0
    for name in names:
        fn = QUERIES[name]
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            failures += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        status = "OK" if (sn, sc, sh) == (on, oc, oh) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"{status} {name}: spark=({sn},{sc},{sh}) duck=({on},{oc},{oh})")
            # show a tiny diff sample
            s2 = sdf[sorted(sdf.columns)].astype(str).apply("|".join, axis=1)
            o2 = odf[sorted(odf.columns)].astype(str).apply("|".join, axis=1)
            only_s = set(s2) - set(o2)
            only_o = set(o2) - set(s2)
            for x in list(only_s)[:3]:
                print("  spark-only:", x[:160])
            for x in list(only_o)[:3]:
                print("  duck-only: ", x[:160])
        else:
            print(f"OK {name}: {sn} rows")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
