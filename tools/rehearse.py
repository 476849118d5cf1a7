#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/rehearse.py <sfDir> <outDir> [name-filter ...]

Reads each Spark-written parquet dir under <outDir>/<name>, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, sorts columns by name on both sides, and compares
row-by-row. Mirrors what we know of the driver gate: row order matters
(queries end in a total-order sort), column names must match, values
must be (hash-)identical.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    name_filter = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracle):
        if name_filter and not any(f in name for f in name_filter):
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; fails.append(name); continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; fails.append(name); continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1; fails.append(name); continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1; fails.append(name); continue
        def norm(x):
            # list/array-valued cells: numpy arrays (and nested ones)
            # have ambiguous truth under ==; canonicalize to lists.
            if hasattr(x, "tolist"):
                return x.tolist()
            if isinstance(x, (list, tuple)):
                return [norm(v) for v in x]
            return x
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                g, e = norm(g), norm(e)
                same = (g == e) or (g is None and e is None)
                if not same and isinstance(g, float) and isinstance(e, float):
                    same = (math.isnan(g) and math.isnan(e))
                if not same:
                    # tolerate pandas NaT/None/nan cross-representation
                    def isnull(x):
                        if x is None: return True
                        if isinstance(x, float) and math.isnan(x): return True
                        return type(x).__name__ == "NaTType"
                    if isnull(g) and isnull(e):
                        same = True
                if not same:
                    bad = (c, i, g, e); break
            if bad: break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: col={c} row={i} spark={g!r} oracle={e!r}")
            n_fail += 1; fails.append(name)
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {fails}" if fails else ""))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
