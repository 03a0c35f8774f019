"""Event-stream operators over the ``events`` table: tumbling-window
aggregation and gap-based sessionization.

The reference is batch/segment-oriented with no streaming runtime
(SURVEY.md §2.10), but a training-data/log pipeline needs windowed
aggregates; these are the batch (event-time) forms:

* ``tumbling_window`` — event-time bucketing is a stateless vectorized
  ``map_batches`` (no shuffle), followed by a native hash aggregate over
  (window, key): Ray pre-aggregates per block map-side, so only
  (window, key, partial) rows shuffle — the partial/combiner pattern.
* ``sessionize`` — per-user gap sessions.  Requires per-key event-time
  order, so it is a ``groupby(user).map_groups`` with a vectorized
  numpy body; the partitioning assumption is that one user's events fit
  one group (true for any real user; whales would need key-salting by
  time range plus a boundary fix-up pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from trinity_ray.rayutil import package_runtime_env

US = 1_000_000


def tumbling_window(ds, *, ts_column: str = "ts", every_s: int = 3600,
                    value_column: str = "value",
                    keys: tuple[str, ...] = ("event_type",)):
    """(window, *keys, n_events, sum_value) — window = floor(epoch / every)."""
    from ray.data.aggregate import Count, Sum

    every_us = every_s * US

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_column).cast(pa.timestamp("us")).cast(pa.int64())
        w = pc.divide(ts, every_us)
        cols = {"window": pc.cast(w, pa.int64())}
        for k in keys:
            cols[k] = batch.column(k)
        # sum in integer cents: float sums depend on addition order across
        # blocks, so cross-engine (and cross-run) equality needs an exact
        # integer accumulator
        cents = pc.round(pc.multiply(batch.column(value_column), 100.0),
                         round_mode="half_towards_infinity")  # == DuckDB round()
        cols["cents"] = pc.cast(cents, pa.int64())
        return pa.table(cols)

    return ds.map_batches(bucket, batch_format="pyarrow",
                          runtime_env=package_runtime_env()) \
             .groupby(["window", *keys]).aggregate(
                 Count(alias_name="n_events"),
                 Sum("cents", alias_name="sum_cents"))


def sessionize(ds, *, ts_column: str = "ts", user_column: str = "user_id",
               gap_s: int = 1800):
    """One row per (user, session): session index (0-based, time order),
    event count, and duration in seconds.  A session breaks when the gap
    between consecutive events exceeds ``gap_s``."""
    gap_us = gap_s * US

    def col_select(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_column).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            user_column: batch.column(user_column),
            "ts_us": ts,
            "event_id": batch.column("event_id"),
        })

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"])
        ts = g["ts_us"].to_numpy()
        new = np.ones(len(g), dtype=np.int64)
        new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ts)) - 1
        return pd.DataFrame({
            user_column: g[user_column].iloc[0],
            "session_idx": np.arange(starts.size, dtype=np.int64),
            "n_events": (ends - starts + 1).astype(np.int64),
            "duration_s": np.round((ts[ends] - ts[starts]) / US, 6),
        })

    return ds.map_batches(col_select, batch_format="pyarrow",
                          runtime_env=package_runtime_env()) \
             .groupby(user_column).map_groups(
                 sessions, batch_format="pandas",
                 runtime_env=package_runtime_env())
