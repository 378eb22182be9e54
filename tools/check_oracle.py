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
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    """Normalize a value WITHOUT erasing its Python type. The driver's
    hash is type-sensitive (an int doc_id != its str form), so the old
    str(v) canonicalization structurally could not catch type drift —
    the r3/r4 q_lsh_dedup bug class. Numeric width is collapsed
    (Decimal/HUGEINT of an integer -> int, matching how both engines
    surface SUM results) but int vs str vs float stay distinct."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        if v == v.to_integral_value():
            return int(v)
        return round(float(v), 6)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def canon(rows, cols):
    """Sort columns by name, normalize values, sort rows -> comparable form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    # mixed-type tuples aren't orderable in py3 -> sort on (typename, str)
    out.sort(key=lambda t: tuple((type(x).__name__, str(x)) for x in t))
    return out


def col_types(rows, cols):
    """Per-column set of python value types (None excluded), post-norm."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    types = {n: set() for n in names}
    for r in rows:
        for n, i in zip(names, order):
            v = norm(r[i])
            if v is not None:
                types[n].add(type(v).__name__)
    return types


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
        st, dt = col_types(srows, scols), col_types(drows, dcols)
        drift = {n: (st[n], dt[n]) for n in st
                 if st[n] and dt[n] and st[n] != dt[n]}
        if drift:
            print(f"TYPE MISMATCH {name}: " + ", ".join(
                f"{n}: spark={sorted(s)} duck={sorted(d)}"
                for n, (s, d) in sorted(drift.items())))
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
