#!/usr/bin/env python3
"""Local differential check mimicking the driver's t2 gate:
run graft.Verify output (parquet per query) against DuckDB executing
oracle_sql.json over the same sf tables; compare row count, schema
(column names), and exact values with columns sorted by name.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            s = s.astype("datetime64[us]")
        out[c] = s.reset_index(drop=True)
    return pd.DataFrame(out)

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if np.isnan(a) and np.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Focused dev loop (round 12): when graft.Verify ran with
    # SPARK_GRAFT_VERIFY_ONLY, only queries matching the SAME prefix
    # filter were dumped — replicate the filter here and SKIP exactly
    # the unselected ones. A SELECTED query with no dump is a crash
    # (Verify logs it to stderr but writes nothing) and must FAIL —
    # round 11 counted any missing dump as SKIP, so the focused loop
    # could report "0 fail" for the very query under test. With the
    # var unset (driver-mode full run) every missing dump is a FAIL.
    only = os.environ.get("SPARK_GRAFT_VERIFY_ONLY")
    prefixes = ([p.strip() for p in only.split(",") if p.strip()]
                if only else None)
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if prefixes is not None and \
                not any(name.startswith(p) for p in prefixes):
            n_skip += 1
            continue
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)],
                                 ignore_index=True))
            exp = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            for i in range(len(got)):
                if not cells_equal(got[c].iloc[i], exp[c].iloc[i]):
                    bad = (c, i, got[c].iloc[i], exp[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: value col={c} row={i} spark={g!r} duck={e!r}")
            n_fail += 1
        else:
            n_pass += 1
    skip = f" / {n_skip} skip (focused)" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{skip} / {len(oracle)} total")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
