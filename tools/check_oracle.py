#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the declared DuckDB oracle SQL
against the same parquet tables, then compares: columns sorted by name,
rows sorted by all columns, values hashed. Prints per-query PASS/FAIL.
Driver-side tooling only (duckdb/pandas are NOT dependencies of the
Scala library).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints to int64, floats to float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(qdir + "/*.parquet")],
                        ignore_index=True) if glob.glob(qdir + "/*.parquet") else pd.DataFrame()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            try:
                canon(got)  # mirror the driver: it sorts rows-only output too,
                            # and dies on unsortable cells (e.g. array columns)
            except Exception as e:
                status = "ROWS-ONLY-UNSORTABLE!"
                n_fail += 1
                print(f"{status:18s} {name:28s} {type(e).__name__}: {e}")
                continue
            n_rowsonly += 1
            print(f"{status:18s} {name:28s} rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{'ORACLE-ERR':18s} {name:28s} {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"{'FAIL-COLS':18s} {name:28s} spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"{'FAIL-ROWS':18s} {name:28s} spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        # The driver's value hash is dtype-sensitive: DuckDB HUGEINT (e.g. a
        # bare sum over BIGINT) reaches pandas as float64 while Spark ships
        # int64 — identical values, different hash. The mirror must be at
        # least as strict as the driver, so dtype mismatch after canon() is
        # a hard failure here too.
        dt_mism = [c for c in g.columns if g[c].dtype != e[c].dtype]
        if dt_mism:
            detail = "; ".join(f"{c}: spark={g[c].dtype} duck={e[c].dtype}" for c in dt_mism)
            print(f"{'FAIL-DTYPE':18s} {name:28s} {detail}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
            print(f"{'PASS':18s} {name:28s} rows={len(g)}")
            n_pass += 1
        except AssertionError as ex:
            msg = str(ex).split("\n")[0]
            # show first differing cell
            neq = (g.values != e.values)
            idx = np.argwhere(neq)
            detail = ""
            if len(idx):
                r, c = idx[0]
                detail = f" first-diff row {r} col {g.columns[c]}: {g.iloc[r, c]!r} vs {e.iloc[r, c]!r}"
            print(f"{'FAIL-VALS':18s} {name:28s} {msg}{detail}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
