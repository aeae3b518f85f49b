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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results = {}

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    unknown = only - set(entrymod.queries())
    if unknown:
        # a typo'd subset name used to run NOTHING and print "0 failures"
        print(f"ERROR unknown query name(s): {sorted(unknown)}")
        sys.exit(2)

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
            results[name] = {"status": "fail", "error": f"spark: {e}"[:300]}
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            results[name] = {
                "status": "rows_only", "rows": len(srows),
                "sec": round(time.time() - t0, 1),
            }
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols_full = [d[0] for d in rel.description]
            orows = [dict(zip(ocols_full, row)) for row in rel.fetchall()]
        except Exception as e:
            failures.append(name)
            results[name] = {"status": "fail", "error": f"duckdb: {e}"[:300]}
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
            results[name] = {"status": "fail", "error": "; ".join(status)[:300]}
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            results[name] = {
                "status": "match", "rows": len(srows),
                "sec": round(time.time() - t0, 1),
            }
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    if json_out:
        import json as _json

        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_match": sum(1 for r in results.values() if r["status"] == "match"),
            "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
            "n_fail": len(failures),
            "queries": results,
        }
        with open(json_out, "w") as fh:
            fh.write(_json.dumps(summary, indent=1, sort_keys=True))
        print(f"wrote {json_out}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
