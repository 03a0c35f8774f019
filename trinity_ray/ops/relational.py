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


def _to_cents(col, scale: float = 100.0):
    """round(value * scale) as int64 — half_towards_infinity matches
    DuckDB's round(), the rounding-parity rule every exact-integer
    comparison in this module depends on."""
    return pc.cast(pc.round(pc.multiply(col, float(scale)),
                            round_mode="half_towards_infinity"),
                   pa.int64())


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
        cents = _to_cents(batch.column(cents_column))
        return pa.table({
            label_column: lab,
            "cents": cents,
        }).filter(pa.array(hit))

    return big_ds.map_batches(annotate, batch_format="pyarrow",
                              runtime_env=package_runtime_env()) \
                 .groupby(label_column).aggregate(
                     Count(alias_name="n_rows"),
                     Sum("cents", alias_name="sum_cents"))


def _check_output_disjoint(op: str, key_column: str, ts_column: str,
                           left_columns, right_names) -> None:
    """Output columns are dict-keyed; a collision would silently
    overwrite a left payload with the matched right value."""
    seen = [key_column, ts_column, *left_columns, *right_names]
    dupes = {c for c in seen if seen.count(c) > 1}
    if dupes:
        raise ValueError(
            f"{op}: output column collision {sorted(dupes)} — rename via "
            f"right_names (key/ts/left_columns/right_names must be "
            f"pairwise distinct)")


def _check_ts_type(op: str, t: pa.DataType) -> bool:
    """Returns is_timestamp; rejects float ts columns (they would be
    silently truncated by the int64 ordering cast)."""
    if pa.types.is_timestamp(t):
        return True
    if pa.types.is_integer(t):
        return False
    raise ValueError(f"{op}: ts column must be a timestamp or integer, "
                     f"not {t}")


def _check_nonnull(batch: pa.Table, key_column: str, ts_column: str,
                   op: str) -> None:
    if (batch.column(key_column).null_count
            or batch.column(ts_column).null_count):
        raise ValueError(f"{op} requires non-null key and ts")


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

    Ray Data has no as-of join; this is the sorted-block composition for
    operators the Dataset API lacks (the same shape as
    ops/window.sessionize): normalize both sides to one schema, ONE
    ``sort((key, ts, side, tie))`` shuffle, then a fully VECTORIZED
    per-block kernel — a segmented max-accumulate matches every left row
    to the last preceding right row of its key with no per-key Python
    call (a ``groupby(key).map_groups`` formulation pays one Python
    invocation per key: fatal at 10^9 keys).

    Because the sort makes each key's rows globally CONTIGUOUS, a block
    resolves every left row locally except those of its FIRST key (which
    may continue from earlier blocks), and only its LAST key's final
    right row can matter to later blocks — so the boundary-stitch pass
    sees O(#blocks + first-key-unmatched-lefts) rows, grouped per
    spanning key.  The kernel output is materialized once (it is
    output-sized) so the resolved stream and the tiny stitch stream don't
    re-execute the sort.

    ``right_names`` renames the emitted right columns (they may collide
    with left names — e.g. both sides carry ``event_id``).  ``right_id``
    names a right column used to break exact-timestamp ties
    deterministically (max id wins); with no ties the result equals the
    oracle regardless.  Null keys or timestamps are rejected.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"not {direction!r}")
    right_names = tuple(right_names or right_columns)
    if len(right_names) != len(right_columns):
        raise ValueError("right_names must match right_columns")
    if right_id is not None and right_id not in right_columns:
        raise ValueError("right_id must be one of right_columns")
    _check_output_disjoint("asof_join", key_column, ts_column,
                           left_columns, right_names)

    lschema = left_ds.schema()
    rschema = right_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    is_ts = _check_ts_type("asof_join", ltypes[ts_column])
    if _check_ts_type("asof_join", rtypes[ts_column]) != is_ts:
        raise ValueError("asof_join: left and right ts columns must both "
                         "be timestamps or both integers")
    ts_t = pa.timestamp("us") if is_ts else ltypes[ts_column]
    fwd = direction == "forward"
    tie_src = right_id

    def _ts_us(col: pa.ChunkedArray) -> pa.ChunkedArray:
        c = col.cast(pa.timestamp("us")).cast(pa.int64()) if is_ts \
            else col.cast(pa.int64())
        return pc.negate_checked(c) if fwd else c

    def _check_nulls(batch: pa.Table) -> None:
        _check_nonnull(batch, key_column, ts_column, "asof_join")

    # one unioned schema: key, ts (original, for output), sort columns
    # (__ts_us negated in forward mode, __ord rights-first, __tie max-id
    # ties), left payload, right payload
    def norm_left(batch: pa.Table) -> pa.Table:
        _check_nulls(batch)
        n = batch.num_rows
        cols = {key_column: batch.column(key_column),
                ts_column: batch.column(ts_column).cast(ts_t),
                "__ts_us": _ts_us(batch.column(ts_column)),
                "__ord": pa.array(np.ones(n, dtype=np.int8)),
                "__tie": pa.array(np.zeros(n, dtype=np.int64))}
        for c in left_columns:
            cols["l_" + c] = batch.column(c)
        for c, nm in zip(right_columns, right_names):
            cols["r_" + nm] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def norm_right(batch: pa.Table) -> pa.Table:
        _check_nulls(batch)
        n = batch.num_rows
        # the kernel always takes the LAST right row in sort order among
        # equal (key, ts): ascending id puts the max id last — in BOTH
        # directions (forward negates only the timestamp)
        tie = (batch.column(tie_src).cast(pa.int64())
               if tie_src is not None
               else pa.chunked_array([np.zeros(n, dtype=np.int64)]))
        cols = {key_column: batch.column(key_column),
                ts_column: batch.column(ts_column).cast(ts_t),
                "__ts_us": _ts_us(batch.column(ts_column)),
                "__ord": pa.array(np.zeros(n, dtype=np.int8)),
                "__tie": tie}
        for c in left_columns:
            cols["l_" + c] = pa.nulls(n, ltypes[c])
        for c, nm in zip(right_columns, right_names):
            cols["r_" + nm] = batch.column(c)
        return pa.table(cols)

    u = left_ds.map_batches(norm_left, batch_format="pyarrow",
                            runtime_env=package_runtime_env()).union(
        right_ds.map_batches(norm_right, batch_format="pyarrow",
                             runtime_env=package_runtime_env()))
    s = u.sort([key_column, "__ts_us", "__ord", "__tie"])

    out_names = [key_column, ts_column] + list(left_columns) \
        + list(right_names)
    aux = ["__kind", "__ts_us", "__tie"]

    def _empty_out(schema: pa.Schema) -> pa.Table:
        cols, names = [], []
        for nm in out_names + aux:
            src = nm
            if nm in left_columns:
                src = "l_" + nm
            elif nm in right_names:
                src = "r_" + nm
            t = (pa.int8() if nm == "__kind"
                 else schema.field(src).type)
            cols.append(pa.array([], t))
            names.append(nm)
        return pa.table(dict(zip(names, cols)))

    def block_kernel(batch: pa.Table) -> pa.Table:
        """Resolve one (key, ts, ord, tie)-sorted block.  Emits __kind=0
        resolved output rows (every left except the first key's
        unmatched heads), __kind=1 unresolved first-key lefts, __kind=2
        the last right row of the block's LAST key (the only right any
        later block can need, by key contiguity)."""
        n = batch.num_rows
        if n == 0:
            return _empty_out(batch.schema)
        batch = batch.combine_chunks()
        k = batch.column(key_column)
        key_start = np.ones(n, dtype=bool)
        if n > 1:
            key_start[1:] = pc.not_equal(
                k.slice(1), k.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
            # key equality with nulls is rejected upstream, so not_equal
            # never yields null here
        key_ord = np.cumsum(key_start, dtype=np.int64) - 1
        is_right = batch.column("__ord").to_numpy(
            zero_copy_only=False) == 0
        big = np.int64(n + 1)
        v = np.where(is_right, np.arange(1, n + 1, dtype=np.int64), 0)
        acc = np.maximum.accumulate(key_ord * big + v)
        mk = acc // big
        mv = acc % big
        valid = (mk == key_ord) & (mv > 0)
        left_rows = np.flatnonzero(~is_right)
        l_valid = valid[left_rows]
        l_first = key_ord[left_rows] == 0
        resolved = left_rows[l_valid | ~l_first]
        unresolved = left_rows[~l_valid & l_first]

        def out_table(rows: np.ndarray, kind: int,
                      match_src: np.ndarray | None,
                      match_ok: np.ndarray | None) -> pa.Table:
            idx = pa.array(rows)
            cols = {key_column: k.take(idx),
                    ts_column: batch.column(ts_column).take(idx)}
            for c in left_columns:
                cols[c] = batch.column("l_" + c).take(idx)
            for nm in right_names:
                col = batch.column("r_" + nm)
                if match_src is None:
                    cols[nm] = col.take(idx)
                else:
                    got = col.take(pa.array(match_src))
                    cols[nm] = pc.if_else(pa.array(match_ok), got,
                                          pa.nulls(len(rows), col.type))
            cols["__kind"] = pa.array(
                np.full(len(rows), kind, dtype=np.int8))
            cols["__ts_us"] = batch.column("__ts_us").take(idx)
            cols["__tie"] = batch.column("__tie").take(idx)
            return pa.table(cols)

        parts = [out_table(resolved, 0,
                           np.maximum(mv[resolved] - 1, 0),
                           valid[resolved]),
                 out_table(unresolved, 1, None, None)]
        # last right of the block's LAST key: acc[-1] always encodes the
        # last key (every row contributes key_ord * big), so mv[-1] > 0
        # iff that key has a right row in this block
        if mv[-1] > 0:
            parts.append(out_table(np.array([mv[-1] - 1]), 2, None, None))
        return pa.concat_tables(parts)

    resolved_all = s.map_batches(block_kernel, batch_size=None,
                                 batch_format="pyarrow",
                                 runtime_env=package_runtime_env()) \
                    .materialize()

    done = resolved_all.filter(expr="__kind == 0").drop_columns(aux)
    pending = resolved_all.filter(expr="__kind != 0")

    def stitch(g: pa.Table) -> pa.Table:
        """Resolve one spanning key's carried lefts against the earlier
        blocks' boundary rights (all of which precede them in the global
        sort, so plain (ts, tie) max-searchsorted is exact)."""
        kind = g.column("__kind").to_numpy(zero_copy_only=False)
        lrows = np.flatnonzero(kind == 1)
        out = {nm: g.column(nm).take(pa.array(lrows))
               for nm in out_names if nm not in right_names}
        rrows = np.flatnonzero(kind == 2)
        ts = g.column("__ts_us").to_numpy(zero_copy_only=False)
        if rrows.size == 0:
            for nm in right_names:
                out[nm] = g.column(nm).take(pa.array(lrows))
            return pa.table(out)
        tie = g.column("__tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie[rrows], ts[rrows]))
        rts = ts[rrows][order]
        idx = np.searchsorted(rts, ts[lrows], side="right") - 1
        ok = idx >= 0
        src = rrows[order[np.maximum(idx, 0)]]
        for nm in right_names:
            col = g.column(nm).take(pa.array(src))
            out[nm] = pc.if_else(pa.array(ok), col,
                                 pa.nulls(lrows.size, col.type))
        return pa.table(out)

    if pending.count() == 0:
        # no spanning keys: skip the stitch stage (an empty map_groups
        # emits schema-less bundles that make the union warn)
        return done
    stitched = pending.groupby(key_column).map_groups(
        stitch, batch_format="pyarrow")
    return done.union(stitched)

def range_count_join(left_ds, right_ds, *, key_column: str, ts_column: str,
                     left_columns: tuple[str, ...],
                     window_s: float, count_name: str = "n_in_window",
                     include_equal: bool = True,
                     sum_cents_column: str | None = None,
                     sum_name: str = "sum_cents"):
    """Per-key range (band) join, aggregate form: for every left row, the
    COUNT of right rows with ``left.ts - window_s <= right.ts <= left.ts``
    (a trailing-window count; ``include_equal=False`` makes the upper
    bound strict).  ``window_s`` is seconds for timestamp columns and the
    column's own integer units otherwise (rounded to int — float window
    arithmetic over int64 epochs would lose precision past 2^53).  The SQL shape is
    ``LEFT JOIN r ON l.k = r.k AND r.ts BETWEEN l.ts - w AND l.ts`` +
    ``GROUP BY l.*`` — a range join Ray Data cannot express natively.

    Same sorted-block composition as :func:`asof_join` — one
    ``sort((key, ts, side))`` shuffle, then a fully vectorized per-block
    kernel: each left row contributes two PROBE points (``ts - w`` and
    ``ts``); one lexsort ranks probes among the block's right rows and a
    per-key cumulative right count turns each probe pair into the window
    count, with no per-key Python call.  Key contiguity after the sort
    means only a block's FIRST key can owe counts to earlier blocks;
    those lefts and the boundary keys' right TIMESTAMPS (ts-only int64
    partials — never payloads) go to a per-spanning-key stitch group,
    where two ``searchsorted`` probes finish the count.  The aggregate
    form is the scale-safe one: emitting matched PAIRS of a range join
    is inherently quadratic in hot windows; counts keep output linear in
    the left side.

    ``sum_cents_column`` additionally emits ``sum_name``: the exact
    integer-cents SUM (``round(value*100)``, NULL values sum as 0 per
    SQL) of that right column over the same window — the cumulative
    trick extends from counts to any associative partial for free."""
    _check_output_disjoint("range_count_join", key_column, ts_column,
                           left_columns,
                           (count_name,) if sum_cents_column is None
                           else (count_name, sum_name))
    if sum_cents_column is None:
        # the internal name must not shadow a legal left column when the
        # sum channel is disabled (stitch/_empty_out test membership)
        sum_name = None
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    is_ts = _check_ts_type("range_count_join", ltypes[ts_column])
    if _check_ts_type("range_count_join", rtypes[ts_column]) != is_ts:
        raise ValueError("range_count_join: left and right ts columns "
                         "must both be timestamps or both integers")
    ts_t = pa.timestamp("us") if is_ts else ltypes[ts_column]
    # integer window in the column's units: float arithmetic over int64
    # timestamps would promote the probe arrays to float64 and lose
    # low-order bits past 2^53
    window_us = int(round(window_s * 1_000_000)) if is_ts \
        else int(round(window_s))

    def norm_left(batch: pa.Table) -> pa.Table:
        _check_nonnull(batch, key_column, ts_column, "range_count_join")
        ts = batch.column(ts_column).cast(ts_t)
        cols = {key_column: batch.column(key_column),
                ts_column: ts,
                "__ts_us": ts.cast(pa.int64()),
                "__ord": pa.array(
                    np.ones(batch.num_rows, dtype=np.int8))}
        if sum_cents_column is not None:
            cols["__cents"] = pa.array(
                np.zeros(batch.num_rows, dtype=np.int64))
        for c in left_columns:
            cols["l_" + c] = batch.column(c)
        return pa.table(cols)

    def norm_right(batch: pa.Table) -> pa.Table:
        _check_nonnull(batch, key_column, ts_column, "range_count_join")
        n = batch.num_rows
        ts = batch.column(ts_column).cast(ts_t)
        cols = {key_column: batch.column(key_column),
                ts_column: ts,
                "__ts_us": ts.cast(pa.int64()),
                "__ord": pa.array(np.zeros(n, dtype=np.int8))}
        if sum_cents_column is not None:
            # SQL SUM ignores nulls: they contribute 0
            cols["__cents"] = pc.fill_null(
                _to_cents(batch.column(sum_cents_column)), 0)
        for c in left_columns:
            cols["l_" + c] = pa.nulls(n, ltypes[c])
        return pa.table(cols)

    u = left_ds.map_batches(norm_left, batch_format="pyarrow",
                            runtime_env=package_runtime_env()).union(
        right_ds.map_batches(norm_right, batch_format="pyarrow",
                             runtime_env=package_runtime_env()))
    s = u.sort([key_column, "__ts_us", "__ord"])

    out_names = [key_column, ts_column] + list(left_columns) \
        + [count_name] + ([] if sum_cents_column is None else [sum_name])
    aux = ["__kind", "__ts_us"]
    # probe tag ordering among equal ts: lo probes (and strict hi probes)
    # rank BEFORE rights, inclusive hi probes AFTER
    hi_tag = 2 if include_equal else 0

    def _empty_out(schema: pa.Schema) -> pa.Table:
        cols = {}
        for nm in out_names + aux:
            if nm in (count_name, sum_name):
                t = pa.int64()
            elif nm == "__kind":
                t = pa.int8()
            elif nm in left_columns:
                t = schema.field("l_" + nm).type
            else:
                t = schema.field(nm).type
            cols[nm] = pa.array([], t)
        return pa.table(cols)

    def block_kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_out(batch.schema)
        batch = batch.combine_chunks()
        k = batch.column(key_column)
        key_start = np.ones(n, dtype=bool)
        if n > 1:
            key_start[1:] = pc.not_equal(
                k.slice(1), k.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
        key_ord = np.cumsum(key_start, dtype=np.int64) - 1
        is_right = batch.column("__ord").to_numpy(
            zero_copy_only=False) == 0
        ts = batch.column("__ts_us").to_numpy(zero_copy_only=False)
        last_key = key_ord[-1]
        left_rows = np.flatnonzero(~is_right)
        l_first = key_ord[left_rows] == 0
        counted = left_rows[~l_first]          # key began in this block
        carried = left_rows[l_first]           # may owe earlier blocks
        # boundary rights: every right of the block's first AND last key
        # (within a key, blocks are ts-ordered, so these are exactly the
        # rights any spanning key has in this block)
        r_rows = np.flatnonzero(is_right)
        r_boundary = r_rows[(key_ord[r_rows] == 0)
                            | (key_ord[r_rows] == last_key)]

        # one probe lexsort counts all counted lefts at once: rights
        # tag 1; lo probes (ts - w) tag 0; hi probes tag hi_tag
        rk, rt = key_ord[r_rows], ts[r_rows]
        ck, ct = key_ord[counted], ts[counted]
        kk = np.concatenate([rk, ck, ck])
        tt = np.concatenate([rt, ct - window_us, ct])
        tag = np.concatenate([
            np.ones(rk.size, dtype=np.int8),
            np.zeros(ck.size, dtype=np.int8),
            np.full(ck.size, hi_tag, dtype=np.int8)])
        order = np.lexsort((tag, tt, kk))
        cum = np.cumsum(tag[order] == 1)
        pos = np.empty(order.size, dtype=np.int64)
        pos[order] = np.arange(order.size)
        at = np.where(tag == 1, 0, cum[pos])   # rights before each probe
        lo = at[rk.size:rk.size + ck.size]
        hi = at[rk.size + ck.size:]
        counts = hi - lo
        sums = None
        cents_all = None
        if sum_cents_column is not None:
            cents_all = batch.column("__cents").to_numpy(
                zero_copy_only=False)
            vals = np.concatenate([
                cents_all[r_rows],
                np.zeros(2 * ck.size, dtype=np.int64)])
            cumv = np.cumsum(vals[order])
            atv = np.where(tag == 1, 0, cumv[pos])
            sums = (atv[rk.size + ck.size:]
                    - atv[rk.size:rk.size + ck.size])

        def out_table(rows, kind, cnt, sm):
            idx = pa.array(rows)
            cols = {key_column: k.take(idx),
                    ts_column: batch.column(ts_column).take(idx)}
            for c in left_columns:
                cols[c] = batch.column("l_" + c).take(idx)
            cols[count_name] = pa.array(
                cnt if cnt is not None
                else np.zeros(len(rows), dtype=np.int64), pa.int64())
            if sum_cents_column is not None:
                # kind-2 rows carry the right's OWN cents so the stitch
                # can re-accumulate them; kind-1 rows carry 0
                cols[sum_name] = pa.array(
                    sm if sm is not None
                    else np.zeros(len(rows), dtype=np.int64), pa.int64())
            cols["__kind"] = pa.array(
                np.full(len(rows), kind, dtype=np.int8))
            cols["__ts_us"] = batch.column("__ts_us").take(idx)
            return pa.table(cols)

        return pa.concat_tables([
            out_table(counted, 0, counts.astype(np.int64), sums),
            out_table(carried, 1, None, None),
            out_table(r_boundary, 2, None,
                      None if cents_all is None else cents_all[r_boundary]),
        ])

    all_rows = s.map_batches(block_kernel, batch_size=None,
                             batch_format="pyarrow",
                             runtime_env=package_runtime_env()) \
                .materialize()
    done = all_rows.filter(expr="__kind == 0").drop_columns(aux)
    pending = all_rows.filter(expr="__kind != 0")

    def stitch(g: pa.Table) -> pa.Table:
        kind = g.column("__kind").to_numpy(zero_copy_only=False)
        lrows = np.flatnonzero(kind == 1)
        rmask = kind == 2
        ts = g.column("__ts_us").to_numpy(zero_copy_only=False)
        rts_raw = ts[rmask]
        r_order = np.argsort(rts_raw)
        rts = rts_raw[r_order]
        lts = ts[lrows]
        hi = np.searchsorted(rts, lts,
                             side="right" if include_equal else "left")
        lo = np.searchsorted(rts, lts - window_us, side="left")
        out = {nm: g.column(nm).take(pa.array(lrows))
               for nm in out_names if nm not in (count_name, sum_name)}
        out[count_name] = pa.array((hi - lo).astype(np.int64))
        if sum_cents_column is not None:
            rc = g.column(sum_name).to_numpy(
                zero_copy_only=False)[rmask][r_order]
            cums = np.concatenate([[0], np.cumsum(rc)])
            out[sum_name] = pa.array(
                (cums[hi] - cums[lo]).astype(np.int64))
        return pa.table(out)

    if pending.count() == 0:
        # no spanning keys: skip the stitch stage (an empty map_groups
        # emits schema-less bundles that make the union warn)
        return done
    stitched = pending.groupby(key_column).map_groups(
        stitch, batch_format="pyarrow")
    return done.union(stitched)



def grouped_top_k(ds, *, group_column: str, order_column: str, k: int,
                  descending: bool = True, tie_column: str | None = None,
                  columns: tuple[str, ...] = ()):
    """Per-group top-k rows by ``order_column`` (the SQL window shape
    ``QUALIFY row_number() OVER (PARTITION BY g ORDER BY o) <= k`` — Ray
    Data has no window functions).  ``tie_column`` breaks order ties
    ascending for a deterministic result.

    Scale shape: each block reduces to AT MOST k rows per group present
    in the block (one vectorized lexsort + segment-rank, no per-group
    Python), so the only shuffle — ``groupby(group)`` over the partials —
    moves <= k x blocks rows per group, never raw data volume; the
    per-group finisher re-ranks those few rows.  The partial/combiner
    discipline of the windowed aggregates applied to a window FUNCTION."""
    if k < 1:
        raise ValueError("k must be >= 1")
    out_cols = [group_column, order_column,
                *(c for c in columns
                  if c not in (group_column, order_column))]
    if tie_column is not None and tie_column not in out_cols:
        out_cols.append(tie_column)

    def block_topk(batch: pa.Table) -> pa.Table:
        batch = batch.select(out_cols).combine_chunks()
        n = batch.num_rows
        if n == 0:
            return batch
        if batch.column(order_column).null_count or (
                tie_column is not None
                and batch.column(tie_column).null_count):
            # null order/tie values would silently materialize an int64
            # column as float64 (precision loss past 2^53) and rank NaN
            raise ValueError("grouped_top_k requires non-null order and "
                             "tie columns")
        o = batch.column(order_column).to_numpy(zero_copy_only=False)
        keys = [o if not descending else _neg_order(o)]
        if tie_column is not None:
            keys.insert(0, batch.column(tie_column).to_numpy(
                zero_copy_only=False))
        # group as the MAJOR key via dictionary codes (works for any
        # group type, including strings, without object-dtype lexsort);
        # combine_chunks() on the COLUMN yields a plain Array with
        # .indices (a Table's columns stay chunked)
        if batch.column(group_column).null_count:
            # Ray's groupby sort cannot compare a null key, and NaN
            # dictionary codes would make every null row its own rank-0
            # segment here — reject upfront with a usable message (the
            # joins' _check_nonnull convention); pre-fill nulls with a
            # sentinel value to window over them
            raise ValueError("grouped_top_k requires a non-null group "
                             "column (fill nulls with a sentinel first)")
        g = batch.column(group_column).combine_chunks().dictionary_encode()
        codes = g.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((*keys, codes))
        gs = codes[order]
        seg_start = np.ones(n, dtype=bool)
        seg_start[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(seg_start)
        rank = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, n)))
        keep = order[rank < k]
        return batch.take(pa.array(keep))

    partials = ds.map_batches(block_topk, batch_format="pyarrow",
                              runtime_env=package_runtime_env())
    # the finisher IS the block combiner re-applied to one group's
    # collected partials (<= k x blocks rows)
    return partials.groupby(group_column).map_groups(
        block_topk, batch_format="pyarrow")


def _neg_order(o: np.ndarray) -> np.ndarray:
    """Descending sort key for lexsort: negate floats directly; every
    other dtype goes through a rank-based negation — raw negation of
    unsigned ints wraps (0 would sort as the maximum) and of INT64_MIN
    overflows back to itself."""
    if np.issubdtype(o.dtype, np.floating):
        return -o
    ranks = np.unique(o, return_inverse=True)[1]
    return -ranks.astype(np.int64)


def grouped_quantile_disc(ds, *, group_column: str, value_column: str,
                          qs: tuple[float, ...] = (0.25, 0.5, 0.9),
                          scale: int = 100):
    """EXACT per-group discrete quantiles (``quantile_disc`` semantics:
    the element at sorted index ``ceil(q * n) - 1``) for values with a
    bounded decimal domain, via a sparse integer histogram: each block
    emits (group, cent, n) partials (cent = round(value * scale)), the
    only shuffle carries one row per DISTINCT (group, cent) pair —
    bounded by groups x domain size, never data volume — and the
    per-group finisher is a cumsum + searchsorted over at most
    domain-size rows.  Exactness without a sort shuffle is what the
    bounded domain buys; unbounded domains need a mergeable quantile
    sketch instead.  NULL values are ignored (SQL aggregate semantics);
    a group whose values are ALL null is OMITTED from the output, where
    SQL GROUP BY would emit it with null quantiles — partials cannot
    represent a group with zero contributing rows.  Returns one row per group with ``q<q*100>_cents``
    integer columns (integer cents compare exactly across engines)."""
    from ray.data.aggregate import Sum

    def cents(batch: pa.Table) -> pa.Table:
        t = pa.table({
            group_column: batch.column(group_column),
            "cent": _to_cents(batch.column(value_column), scale),
        })
        # NULL values never count toward a quantile (quantile_disc /
        # SQL aggregate semantics) — a null cent row would inflate the
        # rank total and can land the index in the null bucket
        if t.column("cent").null_count:
            t = t.filter(pc.is_valid(t.column("cent")))
        # block-local combiner: only distinct (group, cent) pairs leave
        return t.group_by([group_column, "cent"]).aggregate(
            [([], "count_all")]).rename_columns(
            [group_column, "cent", "n"])

    partials = ds.map_batches(cents, batch_format="pyarrow",
                              runtime_env=package_runtime_env()) \
                 .groupby([group_column, "cent"]).aggregate(
                     Sum("n", alias_name="n"))

    names = [f"q{int(round(q * 100))}_cents" for q in qs]

    def finish(g: pa.Table) -> pa.Table:
        c = g.column("cent").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(c)
        c, n = c[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        out = {group_column: g.column(group_column).take(pa.array([0]))}
        for q, nm in zip(qs, names):
            # quantile_disc picks sorted index ceil(q*n) - 1 (pinned
            # against DuckDB over discriminating n/q combinations)
            idx = max(int(np.ceil(q * total)) - 1, 0)
            out[nm] = pa.array(
                [int(c[np.searchsorted(cum, idx + 1)])], pa.int64())
        return pa.table(out)

    return partials.groupby(group_column).map_groups(
        finish, batch_format="pyarrow")


def grouped_quantile_sample(ds, *, group_column: str, value_column: str,
                            key_column: str,
                            qs: tuple[float, ...] = (0.25, 0.5, 0.9),
                            m: int = 1024, salt: str = ""):
    """Approximate per-group quantiles for UNBOUNDED value domains — the
    mergeable sibling of :func:`grouped_quantile_disc` (which needs a
    bounded decimal domain): a deterministic size-m uniform sample per
    group (the m smallest md5 ranks of the row's UNIQUE ``key_column`` —
    a bottom-m sketch, so it is mergeable, partition/order-invariant and
    rerun-stable; hashing the value instead would collapse duplicate
    values to one rank and bias the sample on duplicate-heavy data),
    then ``quantile_disc`` over the sample.  Sampling
    error is the usual O(1/sqrt(m)) in RANK (tests pin a 5/sqrt(m)
    rank-error bound); memory and shuffle are m rows per group per
    block at most.  NULL values never enter the sample (SQL aggregate
    semantics; a sampled NaN would sort into the upper tail).  Use the
    exact histogram variant whenever the domain is bounded."""
    from trinity_ray.ops.sample import md5_rank_hex

    def rank(batch: pa.Table) -> pa.Table:
        vc = batch.column(value_column).combine_chunks()
        if vc.null_count:
            batch = batch.filter(pc.is_valid(vc))
        return pa.table({group_column: batch.column(group_column),
                         value_column: batch.column(value_column),
                         "_h": md5_rank_hex(
                             batch.column(key_column).to_pylist(), salt)})

    sampled = grouped_top_k(
        ds.map_batches(rank, batch_format="pyarrow",
                       runtime_env=package_runtime_env()),
        group_column=group_column, order_column="_h", k=m,
        descending=False, tie_column=value_column,
        columns=(value_column,))

    names = [f"q{int(round(q * 100))}" for q in qs]

    def finish(g: pa.Table) -> pa.Table:
        vals = np.sort(g.column(value_column).to_numpy(
            zero_copy_only=False))
        n = vals.size
        out = {group_column: g.column(group_column).take(pa.array([0]))}
        for q, nm in zip(qs, names):
            out[nm] = pa.array(
                [vals[max(int(np.ceil(q * n)) - 1, 0)]])
        return pa.table(out)

    return sampled.groupby(group_column).map_groups(
        finish, batch_format="pyarrow")
