#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <sf_dir> <verify_out_dir>

For each query parquet in <verify_out_dir> with an entry in
oracle_sql.json: run the SQL in DuckDB over the same tables, sort columns
by name, sort rows, and hash both sides. Reports match/mismatch per query.
Dev tool only — the shipped library never imports duckdb/pyarrow.
"""
import hashlib
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(con, rel_sql):
    rows = con.execute(rel_sql).fetchall()
    cols = [d[0] for d in con.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in mat:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return sorted(cols), len(rows), h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    fails = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        spark_rel = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        scols, srows, shash = table_hash(con, spark_rel)
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({srows} rows)"
                  + ("  [EMPTY!]" if srows == 0 else ""))
            continue
        try:
            ocols, orows, ohash = table_hash(con, oracle[name])
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL error: {e}")
            fails += 1
            continue
        if scols != ocols:
            print(f"  ✗ {name}: schema {scols} != oracle {ocols}")
            fails += 1
        elif shash != ohash:
            print(f"  ✗ {name}: hash mismatch (spark {srows} rows, oracle {orows})")
            fails += 1
        else:
            print(f"  ✓ {name}: {srows} rows")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
