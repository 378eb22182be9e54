#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate: run
graft.Verify output vs DuckDB oracle SQL on the same parquet tables.
Not part of the Scala library. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    """Sort columns by name, normalize values, sort rows -> hashable form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if glob.glob(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING spark output: {name}")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"ORACLE ERROR {name}: {e}")
            n_fail += 1
            continue
        sq = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        if sorted(scols) != sorted(dcols):
            print(f"SCHEMA MISMATCH {name}: spark={sorted(scols)} "
                  f"duck={sorted(dcols)}")
            n_fail += 1
            continue
        a, b = canon(srows, scols), canon(drows, dcols)
        if len(a) != len(b):
            print(f"ROWCOUNT MISMATCH {name}: spark={len(a)} duck={len(b)}")
            n_fail += 1
        elif a != b:
            bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"VALUE MISMATCH {name}: first diffs at rows {bad}")
            for i in bad[:2]:
                print(f"  spark: {a[i]}")
                print(f"  duck : {b[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
