#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tool only).

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL through DuckDB against the same sf parquet tables, and compares:
column names (sorted), row count, and cell values (rows in result order,
columns sorted by name — decimals/doubles/timestamps normalized).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math, datetime, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq = os.path.join(out_dir, name)
        try:
            spark_rel = con.sql(f"SELECT * FROM '{pq}/*.parquet'")
            s_cols = sorted(spark_rel.columns)
            s_rows = [tuple(norm(r[spark_rel.columns.index(c)]) for c in s_cols)
                      for r in spark_rel.fetchall()]
            duck_rel = con.sql(sql)
            d_cols = sorted(duck_rel.columns)
            d_rows = [tuple(norm(r[duck_rel.columns.index(c)]) for c in d_cols)
                      for r in duck_rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}")
            n_fail += 1
        elif s_rows != d_rows:
            msg = f"rows spark={len(s_rows)} duck={len(d_rows)}"
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    msg += f"; first diff at row {i}: spark={a} duck={b}"
                    break
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
            n_pass += 1
    # rows-only check for s_* queries (no oracle)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            status = "ok  " if n > 0 else "FAIL"
            print(f"{status} {d} (spark-only, {n} rows)")
            if n == 0:
                n_fail += 1
            else:
                n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
