"""Event-stream operators over the ``events`` table: tumbling-window
aggregation and gap-based sessionization.

The reference is batch/segment-oriented with no streaming runtime
(SURVEY.md §2.10), but a training-data/log pipeline needs windowed
aggregates; these are the batch (event-time) forms:

* ``tumbling_window`` — event-time bucketing is a stateless vectorized
  ``map_batches`` (no shuffle), followed by a native hash aggregate over
  (window, key): Ray pre-aggregates per block map-side, so only
  (window, key, partial) rows shuffle — the partial/combiner pattern.
* ``sessionize`` — per-user gap sessions, whale-safe: ONE
  sort((user, ts)) shuffle, then session detection over whole sorted
  blocks, then a per-user merge of (start, end, count) MINI-SESSION
  partials that stitches sessions spanning block boundaries.  No task
  ever holds a whale user's raw event volume — the per-user group sees
  only session partials (orders of magnitude smaller), the same
  partial/combiner shape as the windowed aggregate.
"""

from __future__ import annotations

import numpy as np
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


def hopping_window(ds, *, ts_column: str = "ts", size_s: int = 3600,
                   hop_s: int = 1800, value_column: str = "value",
                   keys: tuple[str, ...] = ("event_type",)):
    """Overlapping (hopping/sliding) windows: every event lands in the
    ``size_s / hop_s`` windows covering it; ``window`` = the window's
    start hop index (start time = window * hop_s).

    Bucketing divides by truncation (toward zero), matching
    ``tumbling_window`` and the DuckDB/Arrow integer-divide oracles, so
    the coverage invariant above holds for ``ts >= 0`` only: pre-epoch
    timestamps (negative microseconds) truncate toward zero and land in
    hop indices shifted one window up from floor-division semantics.
    Event-time pipelines here treat timestamps as unsigned epoch offsets;
    pass floor-divided ``ts`` upstream if pre-epoch data ever matters.

    Same scale shape as ``tumbling_window`` — the per-event replication
    happens INSIDE map_batches (np.repeat, factor size/hop, no Python
    loop), then one native hash aggregate over (window, *keys) shuffles
    only map-side partials.  ``size_s`` must be a multiple of ``hop_s``
    (the standard hopping constraint; a tumbling window is size == hop)."""
    from ray.data.aggregate import Count, Sum

    if size_s % hop_s != 0:
        raise ValueError("size_s must be a multiple of hop_s")
    fan = size_s // hop_s
    hop_us = hop_s * US

    def bucket(batch: pa.Table) -> pa.Table:
        ts = (batch.column(ts_column).cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        # newest window containing t; TRUNCATING division (toward zero)
        # like tumbling_window's pc.divide and DuckDB's // — numpy //
        # floors, which diverges for pre-epoch timestamps
        last = np.sign(ts) * (np.abs(ts) // hop_us)
        rep = np.repeat(np.arange(len(ts)), fan)
        w = (np.repeat(last, fan)
             - np.tile(np.arange(fan, dtype=np.int64), len(ts)))
        cents = pc.cast(pc.round(
            pc.multiply(batch.column(value_column), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        rep_pa = pa.array(rep)          # one conversion, reused per column
        cols = {"window": pa.array(w, pa.int64())}
        for k in keys:
            cols[k] = pc.take(batch.column(k), rep_pa)
        cols["cents"] = pc.take(cents, rep_pa)
        return pa.table(cols)

    return ds.map_batches(bucket, batch_format="pyarrow",
                          runtime_env=package_runtime_env()) \
             .groupby(["window", *keys]).aggregate(
                 Count(alias_name="n_events"),
                 Sum("cents", alias_name="sum_cents"))


def session_partials(ds, *, ts_column: str = "ts",
                     user_column: str = "user_id", gap_s: int = 1800):
    """The mini-session (partial/combiner) stage of :func:`sessionize`,
    exposed so the whale guarantee is testable: one sort((user, ts))
    shuffle, then per-sorted-block session detection.  Returns a Dataset
    of (user, start_ts, end_ts, n_events) partials — per user, at most
    (sessions + blocks_spanned - 1) rows, NEVER raw event volume."""
    gap_us = gap_s * US

    def col_select(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_column).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            user_column: batch.column(user_column),
            "ts_us": ts,
            "event_id": batch.column("event_id"),
        })

    def block_sessions(batch: pa.Table) -> pa.Table:
        """Mini-sessions within one (user, ts)-sorted block: a session
        starts on user change or gap > gap_us.  A session that touches a
        block edge may continue in the neighbouring block — the per-user
        merge below stitches those (partial/combiner pattern)."""
        n = batch.num_rows
        if n == 0:
            return pa.table({user_column: batch.column(user_column),
                             "start_ts": pa.array([], pa.int64()),
                             "end_ts": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        u = batch.column(user_column).to_numpy(zero_copy_only=False)
        ts = batch.column("ts_us").to_numpy()
        new = np.ones(n, dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (np.diff(ts) > gap_us)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            user_column: pa.array(u[starts]),
            "start_ts": pa.array(ts[starts], pa.int64()),
            "end_ts": pa.array(ts[ends], pa.int64()),
            "n_events": pa.array((ends - starts + 1), pa.int64()),
        })

    return ds.map_batches(col_select, batch_format="pyarrow",
                          runtime_env=package_runtime_env()) \
             .sort([user_column, "ts_us", "event_id"]) \
             .map_batches(block_sessions, batch_size=None,
                          batch_format="pyarrow",
                          runtime_env=package_runtime_env())


def sessionize(ds, *, ts_column: str = "ts", user_column: str = "user_id",
               gap_s: int = 1800):
    """One row per (user, session): session index (0-based, time order),
    event count, and duration in seconds.  A session breaks when the gap
    between consecutive events exceeds ``gap_s``."""
    gap_us = gap_s * US

    def merge_minis(g) -> "pa.Table":
        """Stitch one user's mini-sessions (already time-disjoint and tiny
        relative to events — whale users shrink from millions of events to
        thousands of partials, so this group NEVER holds raw event volume).
        pyarrow in/out (r5): the pandas group format paid an
        Arrow->pandas->Arrow round-trip per user."""
        import pyarrow as pa

        st = g.column("start_ts").to_numpy(zero_copy_only=False)
        en = g.column("end_ts").to_numpy(zero_copy_only=False)
        ne = g.column("n_events").to_numpy(zero_copy_only=False)
        order = np.lexsort((en, st))
        st, en, ne = st[order], en[order], ne[order]
        new = np.ones(g.num_rows, dtype=bool)
        new[1:] = (st[1:] - en[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        k = int(sid[-1]) + 1
        # repeat the (typed) user value via take — no Python round-trip
        user = g.column(user_column).take(
            pa.array(np.zeros(k, dtype=np.int64)))
        return pa.table({
            user_column: user,
            "session_idx": pa.array(np.arange(k, dtype=np.int64)),
            "n_events": pa.array(
                np.bincount(sid, weights=ne).astype(np.int64)),
            "duration_s": pa.array(np.round(
                (np.maximum.reduceat(en, np.flatnonzero(new))
                 - st[np.flatnonzero(new)]) / US, 6)),
        })

    # ONE wide op (the sort, inside session_partials); only
    # (user, start, end, count) partials reach the per-user merge — no
    # single task ever holds a whale user's full event stream
    return session_partials(ds, ts_column=ts_column,
                            user_column=user_column, gap_s=gap_s) \
        .groupby(user_column).map_groups(
            merge_minis, batch_format="pyarrow",
            runtime_env=package_runtime_env())


def retention_cohorts(ds, *, ts_column: str = "ts",
                      user_column: str = "user_id",
                      period_s: int = 7 * 86400):
    """Cohort retention: ``cohort`` = a user's FIRST activity period
    (floor(epoch / period_s), the tumbling_window convention), and cell
    ``(cohort, period_offset)`` counts the cohort's distinct users still
    active that many periods later — the standard product-analytics
    retention triangle.  Output: (cohort, period_offset, n_users).

    Scale shape: events reduce to per-batch-distinct (user, period)
    pairs before anything shuffles (rows = user-periods, never events);
    ONE groupby(user) computes each user's cohort and offsets in-group
    (group size = a user's distinct periods — cross-batch duplicate
    pairs collapse there too); the final aggregate is vocabulary-sized
    (cohorts x offsets).  No stage ever holds a whale user's raw event
    volume, and no join is needed."""
    from ray.data.aggregate import Count

    period_us = period_s * US

    def pairs_stage(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_column).cast(pa.timestamp("us")).cast(pa.int64())
        per = ts.to_numpy() // period_us
        ucol = batch.column(user_column)
        if pa.types.is_integer(ucol.type):
            # fast path: one packed (user, period) uint64 per pair.
            # Packing needs non-negative fields: period 2^20 covers epoch
            # weeks to year ~21800, users to 2^43 — guard, don't corrupt
            usr = ucol.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(usr) and (per.min() < 0 or per.max() >= (1 << 20)
                             or usr.min() < 0 or usr.max() >= (1 << 43)):
                raise ValueError("user_id/period out of packable range "
                                 "(pre-epoch timestamps or 2^43+ user ids)")
            packed = np.unique((usr.astype(np.uint64) << np.uint64(20))
                               | per.astype(np.uint64))
            return pa.table({
                user_column: pa.array(
                    (packed >> np.uint64(20)).astype(np.int64), pa.int64()),
                "period": pa.array((packed & np.uint64((1 << 20) - 1)
                                    ).astype(np.int64), pa.int64()),
            })
        # generic path (string/UUID user ids): C-side per-batch distinct
        if len(per) and per.min() < 0:
            raise ValueError("pre-epoch timestamps not supported "
                             "(period bucketing truncates at zero)")
        both = pa.table({user_column: ucol,
                         "period": pa.array(per, pa.int64())})
        return both.group_by([user_column, "period"]).aggregate([])

    pairs = ds.map_batches(pairs_stage, batch_format="pyarrow",
                           runtime_env=package_runtime_env())

    def user_offsets(g: pa.Table) -> pa.Table:
        # one group per user: cohort = min period, one output row per
        # DISTINCT period (cross-batch dups collapse here) — group size
        # is a user's distinct periods, never their raw event volume
        per = np.unique(g.column("period").to_numpy(zero_copy_only=False))
        return pa.table({
            "cohort": pa.array(np.full(per.size, per.min(), np.int64),
                               pa.int64()),
            "period_offset": pa.array(per - per.min(), pa.int64()),
        })

    return pairs.groupby(user_column).map_groups(
        user_offsets, batch_format="pyarrow",
        runtime_env=package_runtime_env()) \
        .groupby(["cohort", "period_offset"]).aggregate(
            Count(alias_name="n_users"))
