#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs DuckDB on the oracle SQL dumped by `graft.Verify` and compares each
query's parquet output (row count, schema width, and values after sorting
columns by name and rows by all columns). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so dtype quirks don't mask real diffs
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return float(v)
        if hasattr(v, "timestamp"):  # datetime-like → epoch micros
            return int(v.timestamp() * 1e6)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(canon(x) for x in v)
        try:
            import numpy as np
            if isinstance(v, np.integer): return int(v)
            if isinstance(v, np.floating): return float(v)
        except Exception:
            pass
        return v
    out = df.map(canon)
    return out.sort_values(by=list(out.columns), key=lambda s: s.map(lambda x: (x is None, str(type(x)), x if not isinstance(x, tuple) else str(x)))).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__}: {e}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWS {len(got)} vs {len(exp)}"
            continue
        if sorted(got.columns) != sorted(exp.columns):
            results[name] = f"SCHEMA {sorted(got.columns)} vs {sorted(exp.columns)}"
            continue
        g, e = norm(got), norm(exp)
        if g.equals(e):
            results[name] = "OK"
        else:
            diff = (g != e) & ~(g.isna() & e.isna())
            ncell = int(diff.to_numpy().sum())
            cols = [c for c in g.columns if diff[c].any()]
            results[name] = f"VALUES {ncell} cells differ in {cols}"
            for c in cols[:2]:
                idx = diff[c].idxmax()
                print(f"    {name}.{c}[{idx}]: got={g[c][idx]!r} exp={e[c][idx]!r}")
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else f"  [{v}]"))
    print(f"== {ok}/{len(results)} ok; registered queries without oracle: "
          f"{sorted(set(n.rsplit('/',1)[-1] for n in glob.glob(out_dir+'/*') if '/oracle' not in n) - set(oracle))}")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
