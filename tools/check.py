#!/usr/bin/env python3
"""Dev-loop emulation of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dir in verify_out_dir, runs the matching SQL from
oracle_sql.json in DuckDB over the sf_dir tables, sorts columns by name,
sorts rows, and value-compares (with float tolerance reporting so we can
see *how* close we are — the real driver hashes, so we aim for exact).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(out_dir, sf_dir, timeout_s=None):
    import threading
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracle:
            print(f"  {name}: NO ORACLE (rows-only check) rows={len(got)}")
            continue
        # Per-oracle cursor (own DuckDB connection over the shared
        # catalog) + a done flag: a Timer that loses the race and fires
        # after execute() returns can only interrupt this already-
        # finished cursor, never the NEXT query on the main connection.
        cur = con.cursor()
        timer = None
        timed_out = []
        done = threading.Event()
        if timeout_s:
            def _interrupt(c=cur, d=done, hit=timed_out):
                if not d.is_set():
                    hit.append(1)
                    c.interrupt()
            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
        try:
            exp = cur.execute(oracle[name]).df()
        except Exception as e:
            if timed_out:
                print(f"  {name}: ORACLE TIMEOUT >{timeout_s}s (skipped; "
                      f"engine rows={len(got)})")
                n_skip += 1
            else:
                print(f"  {name}: ORACLE SQL ERROR: {e}")
                n_fail += 1
            continue
        finally:
            done.set()
            if timer:
                timer.cancel()
            cur.close()
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"  {name}: COLUMN MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        ok = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                import pandas as pd
                if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                    bad = ~((gv == ev) | (gv.isna() & ev.isna()))
                    if bad.any():
                        diff = (gv[bad] - ev[bad]).abs().max()
                        print(f"  {name}: FLOAT DIFF col={c} n={bad.sum()} maxabs={diff}")
                        ok = False
                else:
                    gs = gv.astype(str)
                    es = ev.astype(str)
                    bad = gs != es
                    if bad.any():
                        i = bad.idxmax()
                        print(f"  {name}: VALUE MISMATCH col={c} n={bad.sum()} first: spark={gv[i]!r} duck={ev[i]!r}")
                        ok = False
            except Exception as ex:
                print(f"  {name}: COMPARE ERROR col={c}: {ex}")
                ok = False
        if ok:
            print(f"  {name}: PASS rows={len(g)}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} oracle-timeout, "
          f"{len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    to = float(sys.argv[3]) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], to))
