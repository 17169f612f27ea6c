#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify into <verifyOutDir>/<name>/ (parquet),
runs the matching oracle SQL from oracle_sql.json in DuckDB and compares the
way the DRIVER does (r8 post-mortem: the old fetchall/result-order compare
passed two queries the driver failed):
  - BOTH sides become pandas DataFrames. The oracle side comes from
    duckdb `.df()`, so DuckDB dtype coercions happen here too — notably
    sum(BIGINT) -> HUGEINT -> float64, which stringifies as "13929.0" and
    hash-mismatches Spark's int64 "13929" (the q102 r8 red).
  - Columns are sorted by name; rows are sorted by ALL columns via pandas
    sort_values. An array-typed column makes sort_values raise (the q98 r8
    red) — reported as a FAIL, exactly like the driver's `err` row.
  - Values hash as their string rendering, full precision, no slack.
NOTE: driver-side only tooling; the Scala library never depends on this.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Full repr — no rounding slack. If a value differs by even one ulp
    # between engines, we want to see it here, not in the driver.
    if v is None:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays etc. — unreachable after the sortability gate
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(df):
    """Column-sort, row-sort by all columns (driver's pandas compare).
    Raises on unsortable (array-typed) columns, like the driver does."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def df_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update("|".join(norm(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        # Concatenate ALL part files in filename order: Verify coalesce(1)s
        # today, but a multi-file write must not silently compare a subset.
        spark_tbl = pa.concat_tables([pq.read_table(f) for f in files])
        # DECIMAL output columns are banned: engines render trailing zeros
        # differently ("12.50" vs float64 repr "12.5"). Exact decimal math
        # stays INTERNAL; final outputs must be DOUBLE.
        dec_cols = [f.name for f in spark_tbl.schema
                    if pa.types.is_decimal(f.type)]
        if dec_cols:
            results[name] = f"DECIMAL_OUTPUT_COLUMN {dec_cols} (cast to DOUBLE)"
            continue
        # ARRAY/MAP/STRUCT output columns are banned: the driver's pandas
        # sort_values cannot lexsort them -> recorded as `err` (q98, r8).
        # String-render (array_join) before output instead.
        nested = [f.name for f in spark_tbl.schema
                  if pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
                  or pa.types.is_map(f.type) or pa.types.is_struct(f.type)]
        if nested:
            results[name] = f"NESTED_OUTPUT_COLUMN {nested} (driver err; string-render it)"
            continue
        spark_df = spark_tbl.to_pandas()
        if name not in oracles:
            results[name] = f"ROWS_ONLY ({len(spark_df)} rows)"
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            results[name] = (f"SCHEMA_MISMATCH spark={sorted(spark_df.columns)} "
                             f"duck={sorted(duck_df.columns)}")
            continue
        if len(spark_df) != len(duck_df):
            results[name] = (f"ROWCOUNT_MISMATCH spark={len(spark_df)} "
                             f"duck={len(duck_df)}")
            continue
        try:
            s_can, d_can = canon(spark_df), canon(duck_df)
        except Exception as e:
            results[name] = f"DRIVER_ERR (unsortable columns): {type(e).__name__}: {e}"
            continue
        if df_hash(s_can) != df_hash(d_can):
            results[name] = "HASH_MISMATCH"
            for i in range(len(s_can)):
                sr = tuple(norm(v) for v in s_can.iloc[i])
                dr = tuple(norm(v) for v in d_can.iloc[i])
                if sr != dr:
                    results[name] += f" first_diff_row={i} spark={sr} duck={dr}"
                    break
        else:
            results[name] = "OK"
    bad = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" or v.startswith("ROWS_ONLY") else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"[{flag}] {k}: {v}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    write_report(sf_dir, results)
    sys.exit(1 if bad else 0)


def src_fingerprint(repo):
    """SHA-256 over every src/main .scala file (sorted relative path +
    contents). ParityEvidenceSpec recomputes this: parity evidence is only
    valid for the EXACT main-source tree it was produced from, which is the
    mechanical form of the r9 rule 'a query may not ship unless its parity
    evidence postdates its code'."""
    h = hashlib.sha256()
    base = os.path.join(repo, "src", "main", "scala")
    for root, _, files in sorted(os.walk(base)):
        for f in sorted(files):
            if f.endswith(".scala"):
                p = os.path.join(root, f)
                h.update(os.path.relpath(p, base).encode())
                h.update(b"\0")
                with open(p, "rb") as fh:
                    h.update(fh.read())
                h.update(b"\0")
    return h.hexdigest()


def write_report(sf_dir, results):
    import datetime
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    report = {
        "sf": os.path.abspath(sf_dir),
        "when": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "src_sha256": src_fingerprint(repo),
        "results": results,
    }
    out = os.path.join(repo, "parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"[report] {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
