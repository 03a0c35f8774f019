"""Driver-contract rehearsal: run every queries() callable at a given sf
against its oracle_sql() (DuckDB) and report row-count / schema / value
matches — the same comparison shape the driver uses.

Usage: python scripts/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: engine raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} cols={list(mine.columns)} "
                  f"(rows-only, no oracle) [{dt:.1f}s]")
            continue
        try:
            ref = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(ref)
        ok_cols = list(mine.columns) == list(ref.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                              check_exact=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"ok   {name}: rows={len(mine)} MATCH [{dt:.1f}s]")
        else:
            failures += 1
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}; "
                  f"cols {list(mine.columns)} vs {list(ref.columns)}")
            if ok_rows and ok_cols:
                print("  value mismatch:", msg)
                merged = mine.compare(ref) if mine.shape == ref.shape else None
                if merged is not None:
                    print(merged.head(10))
            # dump both frames so a flaky failure can be diagnosed post-hoc
            try:
                mine.to_parquet(f"/tmp/contract_fail_{name}_mine.parquet")
                ref.to_parquet(f"/tmp/contract_fail_{name}_ref.parquet")
                print(f"  dumped /tmp/contract_fail_{name}_{{mine,ref}}.parquet")
            except Exception:
                pass
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
