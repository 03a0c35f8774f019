"""Relational helpers used by the demo pipelines: broadcast join + grouped
aggregate over the TPC-H-ish tables.

The pattern under test is the scale-critical one: the SMALL side (``part``)
ships to the object store ONCE via ``ray.put`` and every map task reads it
zero-copy, annotating the big side (``lineitem``) without any all-to-all
shuffle; the only wide op is the final tiny aggregate over (group-key,
partials).  At 100 TB the small side is a dimension table; re-shipping it
per batch — or hash-joining 10^12 rows — would be the mistake."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trinity_ray.rayutil import package_runtime_env


def broadcast_join_agg(big_ds, small_table: pa.Table, *,
                       big_key: str, small_key: str, label_column: str,
                       cents_column: str):
    """Annotate ``big_ds`` rows with ``label_column`` from the broadcast
    small side, then (label, n_rows, sum_cents) — exact integer sums."""
    import ray
    from ray.data.aggregate import Count, Sum

    keys = small_table.column(small_key).to_numpy()
    order = np.argsort(keys)
    labels_arr = small_table.column(label_column).take(
        pa.array(order)).combine_chunks()
    lookup_ref = ray.put((keys[order], labels_arr))

    def annotate(batch: pa.Table) -> pa.Table:
        skeys, labels = ray.get(lookup_ref)
        bk = batch.column(big_key).to_numpy()
        idx = np.minimum(np.searchsorted(skeys, bk), skeys.size - 1)
        hit = skeys[idx] == bk
        # vectorized label gather: Arrow take on the broadcast label array
        lab = labels.take(pa.array(idx))
        cents = pc.cast(pc.round(pc.multiply(
            batch.column(cents_column), 100.0),
            round_mode="half_towards_infinity"), pa.int64())  # == DuckDB round()
        return pa.table({
            label_column: lab,
            "cents": cents,
        }).filter(pa.array(hit))

    return big_ds.map_batches(annotate, batch_format="pyarrow",
                              runtime_env=package_runtime_env()) \
                 .groupby(label_column).aggregate(
                     Count(alias_name="n_rows"),
                     Sum("cents", alias_name="sum_cents"))


def asof_join(left_ds, right_ds, *, key_column: str, ts_column: str,
              left_columns: tuple[str, ...],
              right_columns: tuple[str, ...],
              right_names: tuple[str, ...] | None = None,
              right_id: str | None = None,
              direction: str = "backward"):
    """Per-key as-of join: for every left row, the single right row with
    the largest ``ts <= left.ts`` (``direction="backward"``, the DuckDB
    ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`` semantics) or the
    smallest ``ts >= left.ts`` (``"forward"``).  Unmatched left rows keep
    nulls in the right columns (left join).

    Ray Data has no as-of join; the reference engine has no joins at all
    (it is an IR library).  This is the documented composition for
    operators the Dataset API lacks: normalize both sides to one schema,
    ONE ``groupby(key)`` shuffle co-locates each key's rows, and the
    per-group kernel is a vectorized ``searchsorted`` of left timestamps
    into the key's sorted right timestamps.  Partitioning assumption: one
    KEY's rows (both sides) fit in a worker — groups are per-user /
    per-entity event streams, orders of magnitude smaller than the table;
    a whale key degrades one task, not the job.

    ``right_names`` renames the emitted right columns (they may collide
    with left names — e.g. both sides carry ``event_id``).  ``right_id``
    names a right column used to break exact-timestamp ties
    deterministically (max id wins); with no ties the result equals the
    oracle regardless.
    """
    import ray  # noqa: F401  (parity with the module's other operators)

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"not {direction!r}")
    right_names = tuple(right_names or right_columns)
    if len(right_names) != len(right_columns):
        raise ValueError("right_names must match right_columns")
    if right_id is not None and right_id not in right_columns:
        raise ValueError("right_id must be one of right_columns")

    lschema = left_ds.schema()
    rschema = right_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    ts_t = pa.timestamp("us") if pa.types.is_timestamp(
        ltypes[ts_column]) else ltypes[ts_column]

    out_left = [c for c in left_columns]
    # one unioned schema: key, ts, side, left payload, right payload
    def norm_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {key_column: batch.column(key_column),
                ts_column: batch.column(ts_column).cast(ts_t),
                "__side": pa.array(np.ones(n, dtype=np.int8))}
        for c in out_left:
            cols["l_" + c] = batch.column(c)
        for c, nm in zip(right_columns, right_names):
            cols["r_" + nm] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def norm_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {key_column: batch.column(key_column),
                ts_column: batch.column(ts_column).cast(ts_t),
                "__side": pa.array(np.zeros(n, dtype=np.int8))}
        for c in out_left:
            cols["l_" + c] = pa.nulls(n, ltypes[c])
        for c, nm in zip(right_columns, right_names):
            cols["r_" + nm] = batch.column(c)
        return pa.table(cols)

    u = left_ds.map_batches(norm_left, batch_format="pyarrow",
                            runtime_env=package_runtime_env()).union(
        right_ds.map_batches(norm_right, batch_format="pyarrow",
                             runtime_env=package_runtime_env()))

    fwd = direction == "forward"
    tie_name = ("r_" + right_names[right_columns.index(right_id)]
                if right_id is not None else None)

    def join_group(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        ts = g.column(ts_column).cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False) \
            if pa.types.is_timestamp(g.schema.field(ts_column).type) \
            else g.column(ts_column).to_numpy(zero_copy_only=False)
        lrows = np.flatnonzero(side == 1)
        rrows = np.flatnonzero(side == 0)
        out = {key_column: g.column(key_column).take(pa.array(lrows)),
               ts_column: g.column(ts_column).take(pa.array(lrows))}
        for c in out_left:
            out[c] = g.column("l_" + c).take(pa.array(lrows))
        if rrows.size == 0:
            for nm in right_names:
                out[nm] = g.column("r_" + nm).take(pa.array(lrows))
            return pa.table(out)
        rts = ts[rrows]
        if tie_name is not None:
            tid = g.column(tie_name).to_numpy(zero_copy_only=False)[rrows]
            order = np.lexsort((tid, rts))      # ties: max id LAST
        else:
            order = np.argsort(rts, kind="stable")
        rts_sorted = rts[order]
        lts = ts[lrows]
        if fwd:
            # smallest right ts >= left ts; ties -> FIRST in sorted order,
            # so flip the tie key to put max id first among equals
            if tie_name is not None:
                order = np.lexsort((-tid, rts))
                rts_sorted = rts[order]
            idx = np.searchsorted(rts_sorted, lts, side="left")
            matched = idx < rts_sorted.size
            idx = np.minimum(idx, rts_sorted.size - 1)
        else:
            # largest right ts <= left ts; side='right' - 1 is the last
            # (max tie id) among equals
            idx = np.searchsorted(rts_sorted, lts, side="right") - 1
            matched = idx >= 0
            idx = np.maximum(idx, 0)
        src = rrows[order[idx]]
        valid = pa.array(matched)
        for nm in right_names:
            col = g.column("r_" + nm).take(pa.array(src))
            out[nm] = pc.if_else(valid, col, pa.nulls(
                len(src), col.type if not isinstance(col, pa.ChunkedArray)
                else col.type))
        return pa.table(out)

    return u.groupby(key_column).map_groups(join_group,
                                            batch_format="pyarrow")


def range_count_join(left_ds, right_ds, *, key_column: str, ts_column: str,
                     left_columns: tuple[str, ...],
                     window_s: float, count_name: str = "n_in_window",
                     include_equal: bool = True):
    """Per-key range (band) join, aggregate form: for every left row, the
    COUNT of right rows with ``left.ts - window_s <= right.ts <= left.ts``
    (a trailing-window count; ``include_equal=False`` makes the upper
    bound strict).  The SQL shape is
    ``LEFT JOIN r ON l.k = r.k AND r.ts BETWEEN l.ts - w AND l.ts`` +
    ``GROUP BY l.*`` — a range join Ray Data cannot express natively.

    Same composition and partitioning assumption as ``asof_join``: one
    ``groupby(key)`` shuffle co-locates each key's rows; the per-group
    kernel is two vectorized ``searchsorted`` probes (window lower bound,
    upper bound) into the key's sorted right timestamps — O((nl+nr) log
    nr) per key, never a nl x nr pair blow-up.  The aggregate form is the
    scale-safe one: emitting matched PAIRS of a range join is inherently
    quadratic in hot windows; counts/aggregates keep output linear in the
    left side."""
    lschema = left_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    ts_t = pa.timestamp("us") if pa.types.is_timestamp(
        ltypes[ts_column]) else ltypes[ts_column]
    window_us = int(round(window_s * 1_000_000)) \
        if pa.types.is_timestamp(ltypes[ts_column]) else window_s

    def norm_left(batch: pa.Table) -> pa.Table:
        cols = {key_column: batch.column(key_column),
                ts_column: batch.column(ts_column).cast(ts_t),
                "__side": pa.array(np.ones(batch.num_rows, dtype=np.int8))}
        for c in left_columns:
            cols["l_" + c] = batch.column(c)
        return pa.table(cols)

    def norm_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {key_column: batch.column(key_column),
                ts_column: batch.column(ts_column).cast(ts_t),
                "__side": pa.array(np.zeros(n, dtype=np.int8))}
        for c in left_columns:
            cols["l_" + c] = pa.nulls(n, ltypes[c])
        return pa.table(cols)

    u = left_ds.map_batches(norm_left, batch_format="pyarrow",
                            runtime_env=package_runtime_env()).union(
        right_ds.map_batches(norm_right, batch_format="pyarrow",
                             runtime_env=package_runtime_env()))

    def join_group(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        if pa.types.is_timestamp(g.schema.field(ts_column).type):
            ts = g.column(ts_column).cast(pa.timestamp("us")).cast(
                pa.int64()).to_numpy(zero_copy_only=False)
        else:
            ts = g.column(ts_column).to_numpy(zero_copy_only=False)
        lrows = np.flatnonzero(side == 1)
        out = {key_column: g.column(key_column).take(pa.array(lrows)),
               ts_column: g.column(ts_column).take(pa.array(lrows))}
        for c in left_columns:
            out[c] = g.column("l_" + c).take(pa.array(lrows))
        rts = np.sort(ts[np.flatnonzero(side == 0)])
        lts = ts[lrows]
        hi = np.searchsorted(rts, lts, side="right" if include_equal
                             else "left")
        lo = np.searchsorted(rts, lts - window_us, side="left")
        out[count_name] = pa.array((hi - lo).astype(np.int64))
        return pa.table(out)

    return u.groupby(key_column).map_groups(join_group,
                                            batch_format="pyarrow")
