"""Local simulation of the driver correctness gate: run every queries()
entry in Spark and its oracle_sql() in DuckDB at a given sf, compare
row-count + schema-width + order-insensitive value comparison.

Usage: python scripts/check_gate.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    # data-dependent oracles (dedup_oracle.py literal tables) must be
    # built against the SAME corpus the Spark side reads
    os.environ["SPARK_GRAFT_GATE_SF_DIR"] = sf_dir

    import __spark_entry__ as e
    from tantivy_spark.session import get_spark

    spark = get_spark("gate_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            print(f"FAIL  {name}: value mismatch on {int(diff.sum())}/{len(g)} rows")
            print("  spark:", g[diff].head(3).to_dict("records"))
            print("  duck :", w[diff].head(3).to_dict("records"))
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(g)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
