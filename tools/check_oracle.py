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


def type_key(t):
    """Canonical arrow-type string for parity checks.

    The driver's hasher is type-sensitive (e.g. DuckDB HUGEINT ->
    decimal128(38,0) vs Spark int64 flips hash_match even when every value is
    equal), so value-equality alone gives false passes. Only differences that
    cannot affect the driver's typed hash are normalized away: the
    string/large_string and list/large_list storage variants.
    """
    import pyarrow as pa
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{type_key(t.value_type)}>"
    return str(t)


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


EXPECTED_DUCKDB = "1.0.0"


def main(sf_dir, out_dir):
    if duckdb.__version__ != EXPECTED_DUCKDB:
        print(f"WARNING: duckdb {duckdb.__version__} != pinned "
              f"{EXPECTED_DUCKDB}; oracle typing/rounding may drift")
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
        type_mismatch = []
        for c in s_cols:
            st = type_key(spark_tbl.schema.field(c).type)
            dt = type_key(duck.schema.field(c).type)
            if st != dt:
                type_mismatch.append((c, st, dt))
        if type_mismatch:
            det = ", ".join(f"{c}: spark={st} duck={dt}"
                            for c, st, dt in type_mismatch)
            print(f"  ✗ {name}: column TYPE drift ({det}) — driver hash "
                  f"is type-sensitive; CAST the oracle SQL")
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
