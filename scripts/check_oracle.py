#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with the payload
parquet tables registered as views, and compares:
  - column name sets
  - row counts
  - order-insensitive multiset of stringified rows (floats via repr)

Dev tool only — NOT part of the shipped library.
"""
import sys, json, glob, os, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_rows(cols, rows):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            # DuckDB HUGEINT/DECIMAL surfaces as float64 in the driver's
            # pandas path — replicate so "5" vs "5.0" mismatches are caught
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                vals.append(repr(v))
            elif isinstance(v, bool):
                vals.append(str(bool(v)).lower())
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        # driver corpus: single file; Spark-written (upscaled) corpus:
        # a directory of part files — DuckDB needs the glob form there
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table().to_pylist() if files else []
        got_cols = sorted(
            con.execute(f"SELECT * FROM read_parquet({files!r}) LIMIT 0").df().columns) if files else []
        if name not in oracle:
            n_skip += 1
            print(f"SKIP  {name}: no oracle ({len(got)} rows)")
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_df = exp_rel.fetch_arrow_table().to_pylist()
            exp_cols = sorted([c[0] for c in exp_rel.description])
        except Exception as e:
            n_fail += 1
            print(f"FAIL  {name}: oracle SQL error: {str(e).splitlines()[0][:160]}")
            continue
        if got_cols != exp_cols:
            n_fail += 1
            print(f"FAIL  {name}: columns {got_cols} != {exp_cols}")
            continue
        a = canon_rows(got_cols, got)
        b = canon_rows(exp_cols, exp_df)
        if len(a) != len(b):
            n_fail += 1
            print(f"FAIL  {name}: rowcount {len(a)} != {len(b)}")
            continue
        if a != b:
            n_fail += 1
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diffs}")
            continue
        n_pass += 1
        print(f"PASS  {name} ({len(a)} rows)")
    # queries that errored inside graft.Verify never wrote a dir; surface
    # them as explicit ERR rows (round-6 postmortem: 18 erroring queries
    # were invisible to anything that read the output dir alone)
    n_err = 0
    meta_path = os.path.join(out_dir, "_meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        for name, err in sorted(meta.get("errors", {}).items()):
            n_err += 1
            print(f"ERR   {name}: {err[:160]}")
        declared = meta.get("declared")
        seen = n_pass + n_fail + n_skip + n_err
        # only MISSING rows are an error (declared > seen — a query
        # vanished without an error record); declared < seen is the
        # dev-loop case of stale dirs from a previous full run beside a
        # prefix-filtered re-run, which is benign
        if declared is not None and declared > seen:
            n_err += 1
            print(f"ERR   _meta: declared {declared} queries but only {seen} accounted for")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle, {n_err} error")
    sys.exit(1 if (n_fail or n_err) else 0)


if __name__ == "__main__":
    main()
