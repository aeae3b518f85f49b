"""Local approximation of the driver's correctness gate.

Runs every queries() entry at the given sf dir, runs the matching
oracle_sql() in DuckDB over the same parquet views, and compares:
row count, sorted column names, and order-insensitive values (exact for
non-floats, tiny-epsilon report for floats so true mismatches stand out).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            elif isinstance(v, (bytes, bytearray)):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    from dbimport_spark import recommended_confs

    builder = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .appName("check_oracle")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    )
    for k, v in recommended_confs(shuffle_partitions=16).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [r.asDict() for r in sdf.collect()]
            # query builders persist() shared subtrees; the runner owns the
            # consuming action, so it owns the release (see
            # dbimport_spark.release_caches)
            spark.catalog.clearCache()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols_full = [d[0] for d in rel.description]
            orows = [dict(zip(ocols_full, row)) for row in rel.fetchall()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ocols = sorted(ocols_full)
        status = []
        if scols != ocols:
            status.append(f"cols spark={scols} duck={ocols}")
        if len(srows) != len(orows):
            status.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not status:
            sc = canon(srows, scols)
            oc = canon(orows, scols)
            if sc != oc:
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                nd = sum(1 for a, b in zip(sc, oc) if a != b)
                status.append(f"values {nd}/{len(sc)} differ, e.g. {diff[:1]}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
