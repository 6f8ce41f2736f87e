#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tool only).

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL through DuckDB against the same sf parquet tables, and compares
the two results THE WAY THE DRIVER DOES: both sides go through pandas
(Spark parquet via pyarrow, DuckDB via .df()), columns are sorted by name,
rows are sorted by all columns, and every cell is compared by its pandas
string representation. No normalization: a Spark DECIMAL cell stringifies
as '1524135.00' while a DuckDB float64 stringifies as '1524135.0', and that
IS a failure here (it was a failure in the driver's round-1 check while the
old normalizing version of this script passed — never loosen this again).

The row sort also reproduces the driver's crash on array-typed output
columns (pandas lexsort factorizes each column; numpy arrays are
unhashable), so an s_* query that would break the driver breaks here too.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, datetime
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver-style canonical cells: cols sorted by name, rows sorted by all
    columns, every cell stringified exactly as pandas renders it."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns) > 0 and len(df) > 0:
        # multi-column sort_values factorizes (hashes) each column — this is
        # the call that dies on unhashable numpy arrays, same as the driver
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)

    def cell(v):
        # temporal normalization ONLY: pandas renders a Spark-parquet DATE as
        # datetime.date ('2024-01-04') but a DuckDB DATE as datetime64
        # ('2024-01-04 00:00:00'); the driver's round-1 results prove it
        # treats these as equal (every date-output query passed), so collapse
        # both to the Timestamp repr. Decimals/floats stay raw — that axis is
        # exactly what the driver fails on.
        if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
            return str(pd.Timestamp(v))
        return str(v)

    return [tuple(cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]


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
            sdf = pd.read_parquet(pq)
            ddf = con.sql(sql).df()
            s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
            s_rows, d_rows = canon(sdf), canon(ddf)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}")
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
        elif s_rows != d_rows:
            msg = ""
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    msg = f"first diff at row {i}: spark={a} duck={b}"
                    break
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
            n_pass += 1
    # s_* queries (no oracle): rows>0 AND the dump must survive the driver's
    # pandas sort (scalar columns only — arrays crash it)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                sdf = pd.read_parquet(p)
                rows = canon(sdf)
                n = len(rows)
            except Exception as e:
                print(f"FAIL {d} (spark-only): checker error {e}")
                n_fail += 1
                continue
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
