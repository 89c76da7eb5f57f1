#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a machine-readable per-query artifact
({"sf": ..., "pass": N, "fail": N, "queries": {name: "pass"|reason}})
— the committed CORRECTNESS_SF01_r* record uses this.

Reads <verifyOutDir>/<name>/ parquet (Spark output) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with the sf
tables registered as views, and compares values (columns sorted by name,
rows in result order; exact equality, with a tiny float tolerance report).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    record = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            record[name] = "no spark output"
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        spark_cols = sorted(spark_tbl.column_names)
        spark_rows = [[r[c] for c in spark_cols] for r in spark_tbl.to_pylist()]
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            record[name] = f"duckdb error: {e}"
            n_fail += 1
            continue
        duck_cols = sorted(duck.column_names)
        duck_rows = [[r[c] for c in duck_cols] for r in duck.to_pylist()]
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}")
            record[name] = "column mismatch"
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            record[name] = f"rows spark={len(spark_rows)} duck={len(duck_rows)}"
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            for j, (x, y) in enumerate(zip(a, b)):
                if x == y:
                    # the driver hashes values, so Decimal(5) vs int(5) still
                    # mismatches there — treat cross-type equality as failure
                    # (bool/int included: arrow never legitimately mixes them)
                    if type(x) is not type(y):
                        bad = (i, spark_cols[j], x, y,
                               f"TYPE {type(x).__name__} vs {type(y).__name__}")
                        break
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if x != y:
                        bad = (i, spark_cols[j], x, y,
                               "float-close" if math.isclose(x, y, rel_tol=1e-12) else "float-FAR")
                        break
                    continue
                bad = (i, spark_cols[j], x, y, "neq")
                break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r} ({bad[4]})")
            record[name] = f"row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r} ({bad[4]})"
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            record[name] = "pass"
            n_pass += 1
    # queries with no oracle -> rows-only check
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracles:
            files = glob.glob(f"{out_dir}/{d}/*.parquet")
            n = pq.read_table(files[0]).num_rows if files else -1
            print(f"ROWS {d}: {n}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        json.dump({"sf": sf_dir, "pass": n_pass, "fail": n_fail,
                   "queries": record}, open(json_out, "w"), indent=1,
                  sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
