"""Driver-contract lint: every oracle_sql() entry must parse in DuckDB.

Guards against oracle-string bugs (unescaped backslash escapes eaten by
Python, column typos, malformed CTEs) that would otherwise surface only
in the driver's CORRECTNESS run."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def test_every_oracle_sql_parses_in_duckdb(ray_session):
    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{p}')")
    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    # every oracle belongs to an existing queries() entry
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))
    bad = {}
    for name, sql in oracles.items():
        if "/tmp/trinity_ray_driver_indexes" in sql:
            # these oracles replay exports the query itself writes (the
            # driver runs query -> oracle in that order); on a cold box
            # the export parquet doesn't exist yet, so produce it first
            try:
                qs[name](sf)
            except Exception as e:      # noqa: BLE001 — collect all failures
                bad[name] = f"query failed producing export: {e}"
                continue
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:          # noqa: BLE001 — collect all failures
            bad[name] = str(e).splitlines()[0]
    assert not bad, bad
