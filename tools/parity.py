#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify into <verifyOutDir>/<name>/ (parquet),
runs the matching oracle SQL from oracle_sql.json in DuckDB (one view per
parquet table, bare table names), and compares:
  - row count
  - column names (sorted)
  - value hash over rows in result order with columns sorted by name
This mirrors the driver's compare as documented (SURVEY.md §2.2).
NOTE: driver-side only tooling; the Scala library never depends on this.
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Full repr for floats — no rounding slack. If a value differs by even
    # one ulp between engines, we want to see it here, not in the driver.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join(norm(row[i]) for i in order).encode())
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
        import pyarrow as pa
        spark_tbl = pa.concat_tables([pq.read_table(f) for f in files])
        spark_cols = spark_tbl.column_names
        # DECIMAL output columns are banned: engines render trailing zeros
        # differently ("12.50" vs float64 repr "12.5"), so any text-normalizing
        # hash compare flags every value whose last decimal digit is 0.
        # Exact decimal math stays INTERNAL; final outputs must be DOUBLE.
        dec_cols = [f.name for f in spark_tbl.schema
                    if pa.types.is_decimal(f.type)]
        if dec_cols:
            results[name] = f"DECIMAL_OUTPUT_COLUMN {dec_cols} (cast to DOUBLE)"
            continue
        spark_rows = [tuple(r[c] for c in spark_cols) for r in spark_tbl.to_pylist()]
        if name not in oracles:
            results[name] = f"ROWS_ONLY ({len(spark_rows)} rows)"
            continue
        try:
            cur = con.execute(oracles[name])
            duck_cols = [dd[0] for dd in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        elif len(spark_rows) != len(duck_rows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
        elif table_hash(spark_cols, spark_rows) != table_hash(duck_cols, duck_rows):
            results[name] = "HASH_MISMATCH"
            for i, (sr, dr) in enumerate(zip(
                    [tuple(norm(v) for v in r) for r in spark_rows],
                    [tuple(norm(duck_rows[j][duck_cols.index(c)]) for c in spark_cols)
                     for j in range(len(duck_rows))])):
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
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
