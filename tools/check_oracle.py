"""Local replica of the driver's correctness gate: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB over the same sf dir, compare
row count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from textgraphs_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    try:
        import datetime
        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat()
    except Exception:
        pass
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "|".join(norm_val(r[i]) for i in order)
        for r in rows
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            results[name] = f"SPARK-ERROR {type(ex).__name__}: {str(ex)[:200]}"
            print(name, results[name])
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)"
            print(name, results[name])
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            results[name] = f"DUCKDB-ERROR {type(ex).__name__}: {str(ex)[:200]}"
            print(name, results[name])
            continue
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            status.append(f"ROWS spark={len(srows)} oracle={len(orows)}")
        if not status:
            sc = canon([tuple(r) for r in srows], scols)
            oc = canon(orows, ocols)
            if sc != oc:
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                status.append(f"VALUES mismatch e.g. {diff}")
        results[name] = "OK" if not status else "; ".join(status)
        print(f"{name}: {results[name]} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    bad = {k: v for k, v in results.items() if v != "OK" and not v.startswith("rows-only")}
    print(f"\n{len(results) - len(bad)}/{len(results)} clean; failures: {list(bad)}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
