#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
sorts columns by name, sorts rows, and compares values exactly (floats: also
reports near-miss tolerance so we can distinguish ulp noise from real bugs).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [colnames[i] for i in order], out


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            spark_cols = spark_tbl.column_names
            spark_rows = [tuple(d.values()) for d in spark_tbl.to_pylist()]
            duck = con.sql(sql)
            duck_cols = duck.columns
            duck_rows = duck.fetchall()
            duck_arrow = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # dtype-strict: the driver hashes values dtype-sensitively, so a
        # DuckDB HUGEINT (→ float64/decimal) vs Spark int64 mismatch fails
        # its gate even when Python-level values compare equal.
        stypes = {c: str(spark_tbl.schema.field(c).type) for c in spark_cols}
        dtypes = {c: str(duck_arrow.schema.field(c).type) for c in duck_arrow.column_names}
        dtype_bad = [
            (c, stypes.get(c), dtypes.get(c)) for c in sorted(set(stypes) | set(dtypes))
            if stypes.get(c) != dtypes.get(c)
        ]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch {dtype_bad}")
            n_fail += 1
            continue
        sc, sr = canon(spark_rows, spark_cols)
        dc, dr = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if not all(cells_equal(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
