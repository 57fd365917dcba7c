#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result, runs the matching SQL from
oracle_sql.json in DuckDB against the sfDir parquet tables, sorts columns by
name, canonicalizes rows, and diffs. Mirrors the documented driver behavior
(column-name sort before value hashing) so oracle mismatches surface before
the round gate runs.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    df = rel.df()
    # compare dtype KIND only: int32 vs int64 hashes the same at the
    # driver, but int vs float does not (r1 p11: HUGEINT -> float64)
    dtypes = [df.dtypes.iloc[i].kind for i in order]
    out = []
    for row in df.itertuples(index=False):
        out.append(tuple(canon(row[i]) for i in order))
    return [cols[i] for i in order], dtypes, out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            spark_cols, spark_dt, spark_rows = rows_of(
                con.sql(f"SELECT * FROM read_parquet('{files[0]}')"))
            ora_cols, ora_dt, ora_rows = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if spark_cols != ora_cols:
            print(f"FAIL {name}: cols {spark_cols} != {ora_cols}")
            n_fail += 1
        elif spark_dt != ora_dt:
            # dtype-level mismatch: str-equal values can still hash-differ
            # at the driver (e.g. DuckDB HUGEINT -> float64 vs int64)
            print(f"FAIL {name}: dtypes {spark_dt} != {ora_dt}")
            n_fail += 1
        elif spark_rows != ora_rows:
            n = len(spark_rows)
            m = len(ora_rows)
            diffs = [i for i, (a, b) in enumerate(zip(spark_rows, ora_rows))
                     if a != b][:3]
            print(f"FAIL {name}: rows {n} vs {m}; first diffs at {diffs}")
            for i in diffs[:2]:
                print(f"   spark : {spark_rows[i]}")
                print(f"   oracle: {ora_rows[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
