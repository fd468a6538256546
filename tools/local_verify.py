#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet tables
and compare values exactly (columns sorted by name, rows in emitted order).

Usage: python3 tools/local_verify.py [sfDir] [outDir]
"""
import json, math, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        duck_rel = con.sql(sql)
        scols = sorted(spark_rel.columns)
        dcols = sorted(duck_rel.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            fails += 1
            continue
        # type-strict: the driver's gate hashes typed values, so a Spark
        # BIGINT vs oracle DOUBLE (say) can hash-mismatch even when str()
        # renders them identically here. Compare DuckDB-side types of both
        # relations (DuckDB's parquet reader types the Spark dump), up to
        # the benign INT32/INT64 widening DuckDB applies to small ints.
        stypes = dict(zip(spark_rel.columns, (str(t) for t in spark_rel.types)))
        dtypes = dict(zip(duck_rel.columns, (str(t) for t in duck_rel.types)))
        WIDEN = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
        tbad = [(c, stypes[c], dtypes[c]) for c in scols
                if stypes[c] != dtypes[c]
                and not (stypes[c] in WIDEN and dtypes[c] in WIDEN)]
        if tbad:
            print(f"FAIL {name}: column types differ: " +
                  ", ".join(f"{c} spark={s} duck={d}" for c, s, d in tbad))
            fails += 1
            continue
        srows = spark_rel.select(*scols).fetchall()
        drows = duck_rel.select(*dcols).fetchall()
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            fails += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            for j, (x, y) in enumerate(zip(a, b)):
                if isinstance(x, float) and isinstance(y, float):
                    ok = (x == y) or (math.isnan(x) and math.isnan(y))
                else:
                    ok = str(x) == str(y)
                if not ok:
                    bad = (i, scols[j], x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            fails += 1
        else:
            print(f"OK   {name}: {len(srows)} rows")
    except Exception as e:
        print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
        fails += 1

no_oracle = []  # queries dumped without oracle
import os
for d in sorted(os.listdir(out)):
    if d.startswith("q_") and d not in oracles:
        no_oracle.append(d)
if no_oracle:
    print("no-oracle (rows-only):", ", ".join(no_oracle))
sys.exit(1 if fails else 0)
