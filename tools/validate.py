#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/validate.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<q>/  (Spark parquet, written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against the
same parquet tables, and compares values with columns sorted by name
(mirroring the driver's compare as documented in the builder brief).

Round-15 hardening: the driver's hash covers PHYSICAL arrow types, not just
values — round 14 shipped three hash-red ids whose values were equal but
whose bare DuckDB `sum(...)` returned decimal128(38,0) against Spark's
int64, and the pandas-coerced value compare below was blind to it. We now
also compare the arrow schema of the Spark parquet against the arrow schema
of the DuckDB result. Integer-width differences (int32 vs int64) are
allowlisted because r14-green ids q_holt_winters.h / q_vocab_coverage.k
carry exactly that pair and pass the driver's hash; every other physical
divergence (decimal vs int, float vs int, ...) is a FAIL.
"""
import json, sys, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

_INT_TYPES = {"int8", "int16", "int32", "int64", "uint8", "uint16",
              "uint32", "uint64"}

def _phys(t) -> str:
    """Canonical physical-type label for driver-hash compatibility."""
    s = str(t)
    if s in _INT_TYPES:
        return "int"  # width differences proven hash-compatible (r14)
    if s == "large_string":
        return "string"
    return s

def arrow_type_diffs(spark_file: str, duck_arrow_schema) -> list:
    """Physical-type mismatches between Spark parquet and DuckDB result."""
    ssch = {f.name: f.type for f in pq.read_schema(spark_file)}
    dsch = {f.name: f.type for f in duck_arrow_schema}
    out = []
    for c, st in ssch.items():
        if c in dsch and _phys(st) != _phys(dsch[c]):
            out.append(f"col {c}: spark={st} duck={dsch[c]}")
    return out

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for value-level comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_arrow = con.execute(sql).arrow()
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = norm(duck_arrow.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}"); n_fail += 1; continue
        tdiffs = arrow_type_diffs(sorted(files)[0], duck_arrow.schema)
        if tdiffs:
            print(f"FAIL {name}: physical type mismatch (driver hash would diverge): "
                  + "; ".join(tdiffs[:4]))
            n_fail += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1; continue
        diffs = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                bad = (~eq).idxmax()
                diffs.append(f"col {c} row {bad}: spark={a[bad]!r} duck={b[bad]!r} "
                             f"({(~eq).sum()} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
