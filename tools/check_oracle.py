#!/usr/bin/env python3
"""Dev-only local pre-flight for the driver's t2 correctness gate.

NOT part of the Scala library. Mirrors the driver's flow: read each
`<out>/<name>` parquet produced by graft.Verify, run the matching oracle SQL
from `<out>/oracle_sql.json` in DuckDB over views of the same sf tables, and
compare schema + sorted rows value-by-value.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    import os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    for name in names:
        spark_tbl = pq.read_table(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only), rows={spark_tbl.num_rows}")
            continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL failed: {str(e)[:200]}")
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"  ✗ {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        s_rows = sorted(tuple(norm(r[c]) for c in s_cols)
                        for r in spark_tbl.to_pylist())
        d_rows = sorted(tuple(norm(r[c]) for c in s_cols)
                        for r in duck.to_pylist())
        if len(s_rows) != len(d_rows):
            print(f"  ✗ {name}: row count spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"  ✗ {name}: {len(bad)}/{len(s_rows)} rows differ; first at {i}:")
            print(f"      cols : {s_cols}")
            print(f"      spark: {a}")
            print(f"      duck : {b}")
            n_fail += 1
        else:
            print(f"  ✓ {name}: {len(s_rows)} rows match")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
