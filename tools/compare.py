#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Registers each <sfDir>/<table>.parquet as a DuckDB view, runs every SQL in
<verifyOutDir>/oracle_sql.json, reads the Spark result parquet for the same
key, sorts columns by name, sorts rows, and compares a stable hash of the
stringified values (like the driver's row/schema/hash match).
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value rendering: floats to 6 sig-places repr, NaN/None -> ''
    def cell(v):
        if v is None:
            return ""
        if isinstance(v, float):
            if pd.isna(v):
                return ""
            return format(v, ".6f")
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    declared = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)))
    for name in declared:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'ROWS' if ok else 'FAIL'} {name}: rows-only check ({len(got)})")
            n_pass += ok
            n_fail += (not ok)
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc_got, sc_exp = sorted(got.columns), sorted(exp.columns)
        if sc_got != sc_exp:
            print(f"FAIL {name}: schema {sc_got} != {sc_exp}")
            n_fail += 1
            continue
        hg, he = canon(got), canon(exp)
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif hg != he:
            print(f"FAIL {name}: hash mismatch")
            # show first few differing rows for debugging
            g = got.reindex(sorted(got.columns), axis=1).astype(str).sort_values(by=sorted(got.columns)).reset_index(drop=True)
            e = exp.reindex(sorted(exp.columns), axis=1).astype(str).sort_values(by=sorted(exp.columns)).reset_index(drop=True)
            diff = (g != e).any(axis=1)
            print(pd.concat([g[diff].head(3).add_prefix("got_"),
                             e[diff].head(3).add_prefix("exp_")], axis=1).to_string())
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
