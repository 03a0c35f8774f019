"""Event-time windowed aggregate + gap sessionization vs brute-force python."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest

from trinity_ray.ops.window import sessionize, tumbling_window

T0 = dt.datetime(2024, 1, 1)


def make_events():
    rng = np.random.default_rng(5)
    rows = []
    t_us = 0
    for i in range(400):
        t_us += int(rng.integers(1, 3000)) * 1_000_000  # 1s..50min gaps
        rows.append({
            "event_id": i,
            "ts": T0 + dt.timedelta(microseconds=t_us),
            "user_id": int(rng.integers(0, 5)),
            "event_type": ["click", "buy"][int(rng.integers(0, 2))],
            "value": float(np.round(rng.uniform(0, 100), 2)),
        })
    return rows


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data as rd

    rows = make_events()
    return rows, rd.from_items(rows)


def test_tumbling_window(events):
    rows, ds = events
    got = {(r["window"], r["event_type"]): (r["n_events"], r["sum_cents"])
           for r in tumbling_window(ds, every_s=3600).take_all()}
    want: dict = {}
    for r in rows:
        w = int(r["ts"].timestamp()) // 3600
        k = (w, r["event_type"])
        n, c = want.get(k, (0, 0))
        want[k] = (n + 1, c + round(r["value"] * 100))
    assert got == want


def test_sessionize(events):
    rows, ds = events
    got = {(r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
           for r in sessionize(ds, gap_s=1800).take_all()}
    # brute force
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r["ts"])
    want = {}
    for u, ts in by_user.items():
        sidx, start, prev, n = 0, ts[0], ts[0], 1
        for t in ts[1:]:
            if (t - prev).total_seconds() > 1800:
                want[(u, sidx)] = (n, round((prev - start).total_seconds(), 6))
                sidx, start, n = sidx + 1, t, 1
            else:
                n += 1
            prev = t
        want[(u, sidx)] = (n, round((prev - start).total_seconds(), 6))
    assert got == want


def test_sessionize_stitches_block_boundaries(ray_session):
    """A whale user whose single long session spans MANY sorted blocks must
    come out as exactly one session (mini-session stitching), and chained
    sub-gap events must never split."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from trinity_ray.ops.window import sessionize

    # user A: 5000 events 60s apart (one giant session: every gap < 1800s)
    # user B: 3 sessions separated by 2h
    n = 5000
    ts_a = 1_700_000_000_000_000 + np.arange(n, dtype=np.int64) * 60 * 1_000_000
    ts_b = np.concatenate([
        1_700_000_000_000_000 + np.arange(5, dtype=np.int64) * 1_000_000,
        1_700_010_000_000_000 + np.arange(4, dtype=np.int64) * 1_000_000,
        1_700_020_000_000_000 + np.arange(3, dtype=np.int64) * 1_000_000,
    ])
    users = ["A"] * n + ["B"] * len(ts_b)
    ts = np.concatenate([ts_a, ts_b])
    order = np.random.default_rng(0).permutation(len(ts))  # unsorted input
    tbl = pa.table({
        "user_id": pa.array([users[i] for i in order]),
        "ts": pa.array(ts[order], pa.timestamp("us")),
        "event_id": pa.array(order.astype(np.int64), pa.int64()),
    })
    ds = rd.from_arrow(tbl).repartition(16)  # force many sorted blocks
    out = sessionize(ds).to_pandas().sort_values(
        ["user_id", "session_idx"]).reset_index(drop=True)
    a = out[out["user_id"] == "A"]
    assert len(a) == 1 and int(a["n_events"].iloc[0]) == n
    assert abs(float(a["duration_s"].iloc[0]) - (n - 1) * 60) < 1e-6
    b = out[out["user_id"] == "B"]
    assert b["n_events"].tolist() == [5, 4, 3]
    assert b["session_idx"].tolist() == [0, 1, 2]


def test_sessionize_whale_at_volume(ray_session):
    """A single user owning far more events than one sort block: the whale
    must span >=2 sorted blocks, and the per-user merge must receive only
    mini-session PARTIALS — bounded by sessions + blocks - 1, never the
    whale's raw event volume (VERDICT r2 next-#9)."""
    import ray.data as rd

    from trinity_ray.ops.window import session_partials

    base = dt.datetime(2024, 1, 1)
    rows = []
    # whale: 40_000 events, a 1h gap every 1000 events -> 40 true sessions
    n_whale, per_sess = 40_000, 1000
    t = base
    for i in range(n_whale):
        if i and i % per_sess == 0:
            t += dt.timedelta(hours=1)
        t += dt.timedelta(seconds=10)
        rows.append({"event_id": i, "user_id": "whale", "ts": t})
    # minnows
    for u in range(20):
        for j in range(5):
            rows.append({"event_id": 100_000 + u * 10 + j,
                         "user_id": f"minnow{u}",
                         "ts": base + dt.timedelta(hours=u, seconds=30 * j)})
    ds = rd.from_items(rows, override_num_blocks=16)
    parts = session_partials(ds, gap_s=1800).to_pandas()
    whale_parts = parts[parts["user_id"] == "whale"]
    n_blocks_spanned = 0
    # partials bound: sessions + (blocks the whale spans - 1); prove the
    # merge never sees raw volume
    assert len(whale_parts) < 200  # 40 sessions + few boundary splits
    assert whale_parts["n_events"].sum() == n_whale
    # the whale genuinely spanned >1 sorted block: more partials than
    # true sessions means at least one session was split at a block edge
    n_sessions = 40
    assert len(whale_parts) > n_sessions
    # end-to-end stitched result is exact
    out = sessionize(ds, gap_s=1800).to_pandas()
    w = out[out["user_id"] == "whale"].sort_values("session_idx")
    assert len(w) == n_sessions
    assert w["n_events"].tolist() == [per_sess] * n_sessions
    assert (w["duration_s"] == 10.0 * (per_sess - 1)).all()
    for u in range(20):
        m = out[out["user_id"] == f"minnow{u}"]
        assert len(m) == 1 and int(m["n_events"].iloc[0]) == 5


def test_hopping_window_covers_each_event_fan_times(ray_session):
    """Every event lands in exactly size/hop windows; a tumbling window is
    the size == hop special case."""
    import pyarrow as pa
    import ray.data as rd

    from trinity_ray.ops.window import hopping_window, tumbling_window

    ts = pa.array([0, 1_700_000_000, 1_900_000_000, 3_600_000_000,
                   5_400_000_000], pa.timestamp("us"))
    t = pa.table({"ts": ts,
                  "event_type": ["a", "a", "b", "a", "b"],
                  "value": [1.0, 2.0, 3.0, 4.0, 5.0]})
    hop = hopping_window(rd.from_arrow(t), size_s=3600, hop_s=1800
                         ).to_pandas()
    # fan = 2: total (window,key) memberships == 2 * n_events
    assert int(hop["n_events"].sum()) == 2 * t.num_rows
    # event at t=5400s (window ids 3 and 2) — spot-check membership
    w3 = hop[(hop["window"] == 3) & (hop["event_type"] == "b")]
    assert w3["n_events"].tolist() == [1] and w3["sum_cents"].tolist() == [500]
    # degenerate hop == size equals the tumbling aggregate
    h2 = hopping_window(rd.from_arrow(t), size_s=3600, hop_s=3600
                        ).to_pandas().sort_values(["window", "event_type"]
                                                  ).reset_index(drop=True)
    tw = tumbling_window(rd.from_arrow(t), every_s=3600
                         ).to_pandas().sort_values(["window", "event_type"]
                                                   ).reset_index(drop=True)
    assert h2.equals(tw)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiple"):
        hopping_window(rd.from_arrow(t), size_s=3600, hop_s=1000)


def test_hll_distinct_error_bound_and_merge(ray_session):
    """HyperLogLog: estimate within the ~1.04/sqrt(m) band of the exact
    count, merge(a, b) == sketch of the union, and the Dataset path agrees
    with the exact sibling per group."""
    import pyarrow as pa
    import ray.data as rd

    from trinity_ray.ops.sketch import (HyperLogLog, distinct_count_exact,
                                        hll_distinct)

    rng = np.random.default_rng(3)
    n, dup = 20_000, 3
    users = rng.integers(0, 1 << 40, n)
    vals = np.repeat(users, dup)          # duplicates must not inflate
    t = pa.table({
        "user_id": pa.array(vals, pa.int64()),
        "event_type": pa.array((["a"] * (n * dup // 2))
                               + (["b"] * (n * dup - n * dup // 2))),
    })
    # repartition: the merge path must run (read-only frombuffer
    # partials were a crash here)
    ds = rd.from_arrow(t).repartition(4)
    est = hll_distinct(ds, "user_id", group_key="event_type", p=12)
    exact = {r["event_type"]: r["n_distinct"]
             for r in distinct_count_exact(ds, "user_id",
                                           group_key="event_type"
                                           ).iter_rows()}
    tol = 3 * 1.04 / np.sqrt(1 << 12)     # 3 sigma ~= 4.9%
    for g, e in exact.items():
        assert abs(est[g] - e) / e < tol, (g, est[g], e)
    # merge == union
    a, b = HyperLogLog(12), HyperLogLog(12)
    u = HyperLogLog(12)
    from trinity_ray.ops.sketch import _hash64
    h1 = _hash64(pa.array(users[:12000], pa.int64()))
    h2 = _hash64(pa.array(users[8000:], pa.int64()))
    a.add_hashes(h1), b.add_hashes(h2)
    u.add_hashes(np.concatenate([h1, h2]))
    assert a.merge(b).estimate() == u.estimate()
    # small-range linear counting is near-exact
    s = HyperLogLog(12)
    s.add_hashes(_hash64(pa.array(np.arange(100), pa.int64())))
    assert abs(s.estimate() - 100) <= 5


def test_hll_distinct_native_keys_and_nulls(ray_session):
    """Group keys keep their native type (int stays int); a null group is
    its own group keyed None; ungrouped returns {None: est}."""
    import pyarrow as pa
    import ray.data as rd

    from trinity_ray.ops.sketch import hll_distinct

    t = pa.table({
        "v": pa.array(list(range(300)), pa.int64()),
        "g": pa.array([1, 2, None] * 100, pa.int64()),
    })
    est = hll_distinct(rd.from_arrow(t).repartition(3), "v", group_key="g")
    assert set(est) == {1, 2, None}
    for k in est:
        assert abs(est[k] - 100) < 10, (k, est[k])
    ung = hll_distinct(rd.from_arrow(t), "v")
    assert set(ung) == {None} and abs(ung[None] - 300) < 20


def test_hopping_truncates_like_tumbling_pre_epoch(ray_session):
    """Division semantics parity: pre-epoch timestamps bucket by
    truncation toward zero in hopping == tumbling (and DuckDB //)."""
    import pyarrow as pa
    import ray.data as rd

    from trinity_ray.ops.window import hopping_window, tumbling_window

    ts = pa.array([-1_000_000, 1_000_000], pa.timestamp("us"))
    t = pa.table({"ts": ts, "event_type": ["a", "a"],
                  "value": [1.0, 1.0]})
    h = hopping_window(rd.from_arrow(t), size_s=3600, hop_s=3600
                       ).to_pandas().sort_values("window")
    tw = tumbling_window(rd.from_arrow(t), every_s=3600
                         ).to_pandas().sort_values("window")
    assert h["window"].tolist() == tw["window"].tolist() == [0]
    assert h["n_events"].tolist() == [2]


def test_distinct_counts_exclude_nulls_and_big_ints(ray_session):
    """NULL values never count toward a distinct total (SQL semantics),
    and int64 values above 2^53 keep exact identity in both the exact
    path and the sketch hashes."""
    import pyarrow as pa
    import ray.data as rd

    from trinity_ray.ops.sketch import (_hash64, distinct_count_exact,
                                        hll_distinct)

    big = (1 << 60)
    t = pa.table({
        "v": pa.array([1, None, big, big + 1, 1, None], pa.int64()),
        "g": pa.array(["a"] * 6),
    })
    exact = {r["g"]: r["n_distinct"]
             for r in distinct_count_exact(rd.from_arrow(t), "v",
                                           group_key="g").iter_rows()}
    assert exact == {"a": 3}                  # 1, big, big+1; nulls dropped
    est = hll_distinct(rd.from_arrow(t), "v", group_key="g")
    assert abs(est["a"] - 3) < 1
    # adjacent >2^53 ints hash distinctly
    h = _hash64(pa.array([big, big + 1], pa.int64()))
    assert h[0] != h[1]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="null-free"):
        _hash64(pa.array([1, None], pa.int64()))


def test_hash64_string_path_vectorized_semantics():
    """The vectorized string path (r5: word-wise splitmix over raw bytes,
    replacing the per-row blake2b loop) must treat slices, binary vs
    string, and embedded NULs correctly and stay collision-free on
    distinct ids."""
    import pyarrow as pa

    from trinity_ray.ops.sketch import _hash64

    ids = pa.array([f"user_{i:06d}" for i in range(50_000)])
    assert len(np.unique(_hash64(ids))) == len(ids)
    # sliced arrays (non-zero Array.offset) hash like their copies
    sl = pa.array(["xx", "abc", "abd", "yy"]).slice(1, 2)
    assert (_hash64(sl) == _hash64(pa.array(["abc", "abd"]))).all()
    # binary == string of the same bytes; large_string == string
    assert (_hash64(pa.array([b"abc"], pa.binary()))
            == _hash64(pa.array(["abc"]))).all()
    assert (_hash64(pa.array(["abc"], pa.large_string()))
            == _hash64(pa.array(["abc"]))).all()
    # zero-padding of the last word must not collide with a real NUL
    assert _hash64(pa.array(["ab"]))[0] != _hash64(pa.array(["ab\x00"]))[0]
    # empty array / empty strings
    assert len(_hash64(pa.array([], pa.string()))) == 0
    e = _hash64(pa.array(["", ""]))
    assert e[0] == e[1]
    # mixed skewed lengths bucket independently (no cross-talk)
    mixed = pa.array(["a", "bb" * 400, "a", "ccc"])
    h = _hash64(mixed)
    assert h[0] == h[2] and len({h[0], h[1], h[3]}) == 3


# ---------------------------------------------------------------------------
# as-of join (ops/relational.asof_join)
# ---------------------------------------------------------------------------

def _brute_asof(rows, direction="backward"):
    """Per-purchase most recent prior click (or next, forward) by user —
    O(n^2) reference; ties on ts broken by max event_id."""
    out = []
    for p in rows:
        if p["event_type"] != "buy":
            continue
        cand = [c for c in rows if c["event_type"] == "click"
                and c["user_id"] == p["user_id"]
                and (c["ts"] <= p["ts"] if direction == "backward"
                     else c["ts"] >= p["ts"])]
        if cand:
            if direction == "backward":
                best = max(cand, key=lambda c: (c["ts"], c["event_id"]))
            else:
                best = min(cand, key=lambda c: (c["ts"], -c["event_id"]))
            out.append((p["event_id"], best["event_id"]))
        else:
            out.append((p["event_id"], None))
    return dict(out)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_vs_bruteforce(events, direction):
    from trinity_ray.ops.relational import asof_join

    rows, ds = events
    left = ds.filter(expr="event_type == 'buy'")
    right = ds.filter(expr="event_type == 'click'")
    res = asof_join(left, right, key_column="user_id", ts_column="ts",
                    left_columns=("event_id",),
                    right_columns=("event_id",),
                    right_names=("click_id",),
                    right_id="event_id", direction=direction).to_pandas()
    got = {int(r.event_id): (None if np.isnan(r.click_id)
                             else int(r.click_id))
           for r in res.itertuples()}
    assert got == _brute_asof(rows, direction)


def test_asof_join_ts_ties_break_by_max_id(ray_session):
    """Two clicks at the purchase's exact timestamp: the max right_id wins
    in BOTH directions (deterministic under any shuffle order)."""
    import ray.data as rd
    from trinity_ray.ops.relational import asof_join

    t = T0 + dt.timedelta(seconds=10)
    left = rd.from_items([{"event_id": 100, "ts": t, "user_id": 1}])
    right = rd.from_items([
        {"event_id": 7, "ts": t, "user_id": 1},
        {"event_id": 9, "ts": t, "user_id": 1},
        {"event_id": 3, "ts": t - dt.timedelta(seconds=5), "user_id": 1},
    ])
    for direction in ("backward", "forward"):
        res = asof_join(left, right, key_column="user_id", ts_column="ts",
                        left_columns=("event_id",),
                        right_columns=("event_id",),
                        right_names=("click_id",),
                        right_id="event_id",
                        direction=direction).to_pandas()
        assert list(res.click_id) == [9], direction


def test_asof_join_unmatched_user_keeps_nulls(ray_session):
    import ray.data as rd
    from trinity_ray.ops.relational import asof_join

    left = rd.from_items([
        {"event_id": 1, "ts": T0, "user_id": 1},
        {"event_id": 2, "ts": T0, "user_id": 2},
    ])
    right = rd.from_items([
        {"event_id": 50, "ts": T0 - dt.timedelta(seconds=1), "user_id": 2},
    ])
    res = asof_join(left, right, key_column="user_id", ts_column="ts",
                    left_columns=("event_id",),
                    right_columns=("event_id", "ts"),
                    right_names=("click_id", "click_ts"),
                    right_id="event_id").to_pandas()
    res = res.sort_values("event_id").reset_index(drop=True)
    assert np.isnan(res.click_id[0]) and res.click_id[1] == 50


def test_range_count_join_vs_bruteforce(events):
    from trinity_ray.ops.relational import range_count_join

    rows, ds = events
    left = ds.filter(expr="event_type == 'buy'")
    right = ds.filter(expr="event_type == 'click'")
    res = range_count_join(left, right, key_column="user_id",
                           ts_column="ts", left_columns=("event_id",),
                           window_s=600).to_pandas()
    got = {int(r.event_id): int(r.n_in_window) for r in res.itertuples()}
    want = {}
    for p in rows:
        if p["event_type"] != "buy":
            continue
        lo = p["ts"] - dt.timedelta(seconds=600)
        want[p["event_id"]] = sum(
            1 for c in rows if c["event_type"] == "click"
            and c["user_id"] == p["user_id"] and lo <= c["ts"] <= p["ts"])
    assert got == want


def test_range_count_join_strict_upper_bound(ray_session):
    import ray.data as rd
    from trinity_ray.ops.relational import range_count_join

    t = T0 + dt.timedelta(seconds=100)
    left = rd.from_items([{"event_id": 1, "ts": t, "user_id": 1}])
    right = rd.from_items([
        {"event_id": 10, "ts": t, "user_id": 1},                      # == ts
        {"event_id": 11, "ts": t - dt.timedelta(seconds=5), "user_id": 1},
        {"event_id": 12, "ts": t - dt.timedelta(seconds=999), "user_id": 1},
    ])
    inc = range_count_join(left, right, key_column="user_id",
                           ts_column="ts", left_columns=("event_id",),
                           window_s=10).to_pandas()
    exc = range_count_join(left, right, key_column="user_id",
                           ts_column="ts", left_columns=("event_id",),
                           window_s=10,
                           include_equal=False).to_pandas()
    assert int(inc.n_in_window[0]) == 2   # equal-ts click counted
    assert int(exc.n_in_window[0]) == 1   # strict: only the -5s click


def test_asof_join_stitches_across_sorted_blocks(ray_session):
    """A whale key spanning many sorted blocks must stitch its carried
    lefts against earlier blocks' boundary rights: interleave one user's
    clicks/buys so early-block rights are the correct match for
    later-block lefts, over many input partitions."""
    import ray.data as rd
    from trinity_ray.ops.relational import asof_join

    rng = np.random.default_rng(11)
    rows = []
    t_us = 0
    for i in range(600):
        t_us += int(rng.integers(1, 50)) * 1_000_000
        rows.append({"event_id": i,
                     "ts": T0 + dt.timedelta(microseconds=t_us),
                     # one whale user + a handful of minnows
                     "user_id": 1 if i % 3 else int(rng.integers(2, 6)),
                     "event_type": ["click", "buy"][int(rng.integers(0, 2))]})
    # long click-free stretch: lefts must reach far back across blocks
    for r in rows[200:320]:
        if r["user_id"] == 1:
            r["event_type"] = "buy"
    ds = rd.from_items(rows).repartition(16)
    left = ds.filter(expr="event_type == 'buy'")
    right = ds.filter(expr="event_type == 'click'")
    res = asof_join(left, right, key_column="user_id", ts_column="ts",
                    left_columns=("event_id",), right_columns=("event_id",),
                    right_names=("click_id",),
                    right_id="event_id").to_pandas()
    got = {int(r.event_id): (None if np.isnan(r.click_id)
                             else int(r.click_id))
           for r in res.itertuples()}
    assert got == _brute_asof(rows, "backward")
    assert len(got) == sum(r["event_type"] == "buy" for r in rows)


def test_range_count_join_stitches_across_sorted_blocks(ray_session):
    """Whale key spanning many sorted blocks: carried lefts count rights
    from earlier blocks through the ts-only boundary partials."""
    import ray.data as rd
    from trinity_ray.ops.relational import range_count_join

    rng = np.random.default_rng(23)
    rows = []
    t_us = 0
    for i in range(600):
        t_us += int(rng.integers(1, 40)) * 1_000_000
        rows.append({"event_id": i,
                     "ts": T0 + dt.timedelta(microseconds=t_us),
                     "user_id": 1 if i % 3 else int(rng.integers(2, 6)),
                     "event_type": ["click", "buy"][int(rng.integers(0, 2))]})
    ds = rd.from_items(rows).repartition(16)
    left = ds.filter(expr="event_type == 'buy'")
    right = ds.filter(expr="event_type == 'click'")
    res = range_count_join(left, right, key_column="user_id",
                           ts_column="ts", left_columns=("event_id",),
                           window_s=300).to_pandas()
    got = {int(r.event_id): int(r.n_in_window) for r in res.itertuples()}
    want = {}
    for p in rows:
        if p["event_type"] != "buy":
            continue
        lo = p["ts"] - dt.timedelta(seconds=300)
        want[p["event_id"]] = sum(
            1 for c in rows if c["event_type"] == "click"
            and c["user_id"] == p["user_id"] and lo <= c["ts"] <= p["ts"])
    assert got == want
    assert len(got) == sum(r["event_type"] == "buy" for r in rows)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (ops/sketch.MisraGries / heavy_hitters)
# ---------------------------------------------------------------------------

def test_misra_gries_bounds_and_merge():
    from trinity_ray.ops.sketch import MisraGries

    rng = np.random.default_rng(7)
    # zipf-ish stream over 2000 distinct items
    data = (rng.zipf(1.3, size=50_000) % 2000).astype(str)
    items, counts = np.unique(data, return_counts=True)
    true = dict(zip(items.tolist(), counts.tolist()))

    # one summary over the whole stream
    whole = MisraGries(64)
    whole.add_counts(items.tolist(), counts)
    # split into 7 summaries, tree-merged via the row protocol
    import pyarrow as pa
    parts = []
    for chunk in np.array_split(data, 7):
        ci, cc = np.unique(chunk, return_counts=True)
        s = MisraGries(64)
        s.add_counts(ci.tolist(), cc)
        parts.append(s.to_rows())
    merged = MisraGries.from_rows(pa.concat_tables(parts), 64)

    for s in (whole, merged):
        err = s.error()
        assert err > 0
        for it, cl in s.counts.items():
            t = true[it]
            assert cl <= t <= cl + err, (it, cl, t, err)
        # guarantee: every item with true count > error is present
        for it, t in true.items():
            if t > err:
                assert it in s.counts, (it, t, err)


def test_misra_gries_split_summary_accounting():
    """Rows of ONE summary split across merge tasks must not lose or
    double decrement accounting (the marker-row protocol)."""
    import pyarrow as pa
    from trinity_ray.ops.sketch import MisraGries

    s = MisraGries(4)
    s.add_counts([str(i) for i in range(16)],
                 np.arange(1, 17, dtype=np.int64))
    rows = s.to_rows()
    a = MisraGries.from_rows(rows.slice(0, 2), 4)
    b = MisraGries.from_rows(rows.slice(2), 4)
    rejoined = MisraGries.from_rows(
        pa.concat_tables([a.to_rows(), b.to_rows()]), 4)
    # the recorded error never shrinks below the source summary's, and
    # every surviving lower bound stays a lower bound of the original
    assert rejoined.error() >= s.error()
    for it, cl in rejoined.counts.items():
        assert cl <= s.counts.get(it, 0) + s.error()


def test_heavy_hitters_dataset(ray_session):
    import ray.data as rd
    from trinity_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(3)
    vals = (rng.zipf(1.5, size=30_000) % 500).astype(str).tolist()
    ds = rd.from_items([{"term": v} for v in vals]).repartition(10)
    t = heavy_hitters(ds, "term", m=64, fanout=4)
    items, counts = np.unique(np.asarray(vals), return_counts=True)
    true = dict(zip(items.tolist(), counts.tolist()))
    err = int(t.column("error")[0].as_py())
    got = dict(zip(t.column("item").to_pylist(),
                   t.column("count_lower").to_pylist()))
    assert 0 < len(got) <= 64
    for it, cl in got.items():
        assert cl <= true[it] <= cl + err
    for it, n in true.items():
        if n > err:
            assert it in got, (it, n, err)
    # output is count-desc sorted
    cl = t.column("count_lower").to_numpy()
    assert (np.diff(cl) <= 0).all()


def test_asof_join_rejects_colliding_output_columns(ray_session):
    import ray.data as rd
    from trinity_ray.ops.relational import asof_join, range_count_join

    left = rd.from_items([{"event_id": 1, "ts": T0, "user_id": 1}])
    right = rd.from_items([{"event_id": 2, "ts": T0, "user_id": 1}])
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, key_column="user_id", ts_column="ts",
                  left_columns=("event_id",),
                  right_columns=("event_id",))  # default name collides
    with pytest.raises(ValueError, match="collision"):
        range_count_join(left, right, key_column="user_id",
                         ts_column="ts", left_columns=("event_id",),
                         window_s=10, count_name="event_id")


def test_range_count_join_integer_ts_stays_exact(ray_session):
    """Integer ts columns beyond 2^53 must not round-trip through
    float64: two rights 1 unit apart at 2^60 are distinguished."""
    import ray.data as rd
    from trinity_ray.ops.relational import range_count_join

    base = 1 << 60
    left = rd.from_items([{"lid": 1, "t": base + 2, "k": 1}])
    right = rd.from_items([{"t": base, "k": 1},
                           {"t": base + 1, "k": 1},
                           {"t": base + 2, "k": 1}])
    res = range_count_join(left, right, key_column="k", ts_column="t",
                           left_columns=("lid",),
                           window_s=1).to_pandas()
    # window [base+1, base+2]: exactly 2 rights
    assert int(res.n_in_window[0]) == 2


# ---------------------------------------------------------------------------
# JSON extraction (ops/jsonx)
# ---------------------------------------------------------------------------

def test_joined_buffer_slices_and_empties():
    import pyarrow as pa
    from trinity_ray.ops.jsonx import joined_buffer

    a = pa.array(['{"k": 1}', "", '{"k": 3}'])
    assert joined_buffer(a) == b'{"k": 1}\n\n{"k": 3}\n'
    assert joined_buffer(a.slice(1)) == b'\n{"k": 3}\n'
    assert joined_buffer(pa.array([], pa.string())) == b""


def test_extract_json_typed_fields(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from trinity_ray.ops.jsonx import extract_json

    rows = [{"id": 0, "props": '{"k": 7, "tag": "a"}'},
            {"id": 1, "props": '{"k": 8}'},            # missing tag
            {"id": 2, "props": None},                   # null value
            {"id": 3, "props": ""},                     # empty string
            {"id": 4, "props": '{"tag": "b"}'}]         # missing k
    ds = rd.from_items(rows)
    out = extract_json(ds, "props",
                       {"k": pa.int64(), "tag": pa.string()},
                       keep=("id",)).to_pandas().sort_values("id")
    assert out.k.tolist()[:2] == [7, 8]
    assert np.isnan(out.k.tolist()[2]) and np.isnan(out.k.tolist()[3])
    assert out.tag.tolist()[0] == "a" and out.tag.tolist()[4] == "b"
    assert out.tag.isna().tolist() == [False, True, True, True, False]


def test_extract_json_multiline_value_ok_but_misalignment_raises(
        ray_session):
    """Arrow's JSON reader consumes an object STREAM: newlines between
    tokens are legal whitespace (one multi-line object still parses to
    one row); a cell smuggling TWO objects would shift every later row
    and must be caught by the row-count guard."""
    import pyarrow as pa
    import ray.data as rd
    from trinity_ray.ops.jsonx import extract_json

    ds = rd.from_items([{"props": '{"k":\n 1}'}])
    out = extract_json(ds, "props", {"k": pa.int64()}).to_pandas()
    assert out.k.tolist() == [1]

    bad = rd.from_items([{"props": '{"k": 1} {"k": 2}'}])
    with pytest.raises(Exception, match="rows for|misalign"):
        extract_json(bad, "props", {"k": pa.int64()}).to_pandas()


def test_grouped_top_k_vs_bruteforce(ray_session):
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_top_k

    rng = np.random.default_rng(31)
    rows = [{"g": int(rng.integers(0, 6)), "v": int(rng.integers(0, 50)),
             "id": i} for i in range(400)]
    ds = rd.from_items(rows).repartition(8)
    for desc in (True, False):
        res = grouped_top_k(ds, group_column="g", order_column="v",
                            k=4, descending=desc,
                            tie_column="id").to_pandas()
        got = {}
        for r in res.itertuples():
            got.setdefault(r.g, []).append((r.v, r.id))
        want = {}
        for r in sorted(rows, key=lambda r: (r["g"],
                                             -r["v"] if desc else r["v"],
                                             r["id"])):
            want.setdefault(r["g"], [])
            if len(want[r["g"]]) < 4:
                want[r["g"]].append((r["v"], r["id"]))
        assert {g: sorted(v) for g, v in got.items()} == \
            {g: sorted(v) for g, v in want.items()}, desc


def test_grouped_top_k_small_groups_and_k1(ray_session):
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_top_k

    ds = rd.from_items([{"g": "a", "v": 1, "id": 0},
                        {"g": "b", "v": 5, "id": 1},
                        {"g": "b", "v": 5, "id": 2}])
    res = grouped_top_k(ds, group_column="g", order_column="v", k=1,
                        tie_column="id").to_pandas()
    got = dict(zip(res.g, res.id))
    assert got == {"a": 0, "b": 1}   # tie at v=5 -> smaller id wins


def test_sample_exact_k_partition_invariant(ray_session):
    """Bottom-k sample picks the SAME rows regardless of partitioning,
    and exactly k of them."""
    import ray.data as rd
    from trinity_ray.ops.sample import sample_exact_k

    rows = [{"doc_id": i, "lang": "x"} for i in range(300)]
    a = sample_exact_k(rd.from_items(rows), 20).to_pandas()
    b = sample_exact_k(rd.from_items(rows).repartition(13), 20).to_pandas()
    assert len(a) == len(b) == 20
    assert sorted(a.doc_id) == sorted(b.doc_id)
    # brute-force: k smallest md5 ranks
    import hashlib
    want = sorted(range(300),
                  key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
                  )[:20]
    assert sorted(a.doc_id) == sorted(want)


def test_grouped_quantile_disc_vs_bruteforce(ray_session):
    """quantile_disc = sorted element at ceil(q*n)-1; exact via the
    sparse cents histogram under any partitioning."""
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_quantile_disc

    rng = np.random.default_rng(41)
    rows = [{"g": ["a", "b"][int(rng.integers(0, 2))],
             "v": float(np.round(rng.uniform(0, 30), 2))}
            for _ in range(337)]
    ds = rd.from_items(rows).repartition(7)
    res = grouped_quantile_disc(ds, group_column="g", value_column="v",
                                qs=(0.25, 0.5, 0.9)).to_pandas()
    got = {r.g: (r.q25_cents, r.q50_cents, r.q90_cents)
           for r in res.itertuples()}
    for g in ("a", "b"):
        vals = np.sort(np.array(
            [int(round(r["v"] * 100)) for r in rows if r["g"] == g]))
        n = vals.size
        want = tuple(int(vals[max(int(np.ceil(q * n)) - 1, 0)])
                     for q in (0.25, 0.5, 0.9))
        assert got[g] == want, g


def test_grouped_quantile_sample_rank_error(ray_session):
    """Sampled quantiles land within 5/sqrt(m) RANK error of the truth,
    and the sample is partition-invariant."""
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_quantile_sample

    rng = np.random.default_rng(53)
    rows = [{"g": "a", "v": float(rng.lognormal(0, 2))}
            for _ in range(20_000)]
    m = 1024
    rows = [dict(r, rid=i) for i, r in enumerate(rows)]
    res = grouped_quantile_sample(
        rd.from_items(rows).repartition(11), group_column="g",
        value_column="v", key_column="rid", qs=(0.25, 0.5, 0.9),
        m=m).to_pandas()
    res2 = grouped_quantile_sample(
        rd.from_items(rows).repartition(3), group_column="g",
        value_column="v", key_column="rid", qs=(0.25, 0.5, 0.9),
        m=m).to_pandas()
    assert res.iloc[0].tolist() == res2.iloc[0].tolist()
    vals = np.sort(np.array([r["v"] for r in rows]))
    tol = 5.0 / np.sqrt(m)
    for q, nm in ((0.25, "q25"), (0.5, "q50"), (0.9, "q90")):
        est = float(res[nm].iloc[0])
        true_rank = np.searchsorted(vals, est) / vals.size
        assert abs(true_rank - q) <= tol, (q, est, true_rank)


def test_grouped_top_k_rejects_null_groups(ray_session):
    """Ray's groupby sort cannot compare null keys, and NaN dictionary
    codes would give every null row rank 0 — a clear upfront error
    beats either failure mode."""
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_top_k

    rows = ([{"g": None, "v": i, "id": i} for i in range(10)]
            + [{"g": "a", "v": i, "id": 100 + i} for i in range(5)])
    with pytest.raises(Exception, match="non-null group"):
        grouped_top_k(rd.from_items(rows), group_column="g",
                      order_column="v", k=2,
                      tie_column="id").to_pandas()


def test_grouped_top_k_unsigned_descending(ray_session):
    """uint64 order columns must not wrap under negation (0 is the
    smallest, not the largest)."""
    import pyarrow as pa
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_top_k

    t = pa.table({"g": ["x"] * 4,
                  "v": pa.array([0, 5, 3, 2], pa.uint64()),
                  "id": pa.array([0, 1, 2, 3], pa.int64())})
    ds = rd.from_arrow(t)
    res = grouped_top_k(ds, group_column="g", order_column="v", k=2,
                        tie_column="id").to_pandas()
    assert sorted(res.v) == [3, 5]


def test_grouped_quantile_disc_skips_nulls(ray_session):
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_quantile_disc

    rows = [{"g": "a", "v": 1.0}, {"g": "a", "v": None},
            {"g": "a", "v": None}, {"g": "a", "v": 3.0}]
    res = grouped_quantile_disc(rd.from_items(rows), group_column="g",
                                value_column="v",
                                qs=(0.5,)).to_pandas()
    # quantile_disc over [1.0, 3.0]: ceil(0.5*2)-1 = 0 -> 1.0 (100 cents)
    assert int(res.q50_cents.iloc[0]) == 100


def test_extract_json_whitespace_cell_is_blank(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from trinity_ray.ops.jsonx import extract_json

    ds = rd.from_items([{"id": 0, "props": "   "},
                        {"id": 1, "props": '{"k": 9}'}])
    out = extract_json(ds, "props", {"k": pa.int64()},
                       keep=("id",)).to_pandas().sort_values("id")
    assert np.isnan(out.k.iloc[0]) and out.k.iloc[1] == 9


def test_extract_json_rejects_field_collision(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from trinity_ray.ops.jsonx import extract_json

    ds = rd.from_items([{"id": 0, "props": "{}"}])
    with pytest.raises(ValueError, match="collide"):
        extract_json(ds, "props", {"id": pa.int64()}, keep=("id",))


def test_grouped_quantile_sample_duplicate_heavy(ray_session):
    """90% duplicates of one value: the unique-key hash keeps the
    duplicate mass proportionally represented (hashing the value would
    collapse it to one rank and estimate a tail value)."""
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_quantile_sample

    rng = np.random.default_rng(61)
    rows = [{"g": "a", "rid": i,
             "v": 1.0 if i % 10 else float(rng.uniform(100, 200))}
            for i in range(10_000)]
    res = grouped_quantile_sample(
        rd.from_items(rows).repartition(5), group_column="g",
        value_column="v", key_column="rid", qs=(0.5,),
        m=512).to_pandas()
    assert float(res.q50.iloc[0]) == 1.0   # the true median


def test_range_sum_join_vs_bruteforce_across_blocks(ray_session):
    """Windowed sum (integer cents) with a whale key spanning blocks:
    exact against brute force, including null values summing as 0."""
    import ray.data as rd
    from trinity_ray.ops.relational import range_count_join

    rng = np.random.default_rng(67)
    rows = []
    t_us = 0
    for i in range(500):
        t_us += int(rng.integers(1, 40)) * 1_000_000
        rows.append({"event_id": i,
                     "ts": T0 + dt.timedelta(microseconds=t_us),
                     "user_id": 1 if i % 3 else int(rng.integers(2, 5)),
                     "event_type": ["click", "buy"][int(rng.integers(0, 2))],
                     "value": (None if i % 17 == 0
                               else float(np.round(rng.uniform(0, 50), 2)))})
    ds = rd.from_items(rows).repartition(12)
    left = ds.filter(expr="event_type == 'buy'")
    right = ds.filter(expr="event_type == 'click'")
    res = range_count_join(left, right, key_column="user_id",
                           ts_column="ts", left_columns=("event_id",),
                           window_s=240, sum_cents_column="value",
                           sum_name="cents").to_pandas()
    got = {int(r.event_id): (int(r.n_in_window), int(r.cents))
           for r in res.itertuples()}
    want = {}
    for p in rows:
        if p["event_type"] != "buy":
            continue
        lo = p["ts"] - dt.timedelta(seconds=240)
        sel = [c for c in rows if c["event_type"] == "click"
               and c["user_id"] == p["user_id"] and lo <= c["ts"] <= p["ts"]]
        want[p["event_id"]] = (
            len(sel),
            sum(int(round(c["value"] * 100)) for c in sel
                if c["value"] is not None))
    assert got == want


def test_extract_json_ignores_unrequested_mixed_type_fields(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from trinity_ray.ops.jsonx import extract_json

    ds = rd.from_items([{"props": '{"k": 1, "x": 1}'},
                        {"props": '{"k": 2, "x": "s"}'}])
    out = extract_json(ds, "props", {"k": pa.int64()}).to_pandas()
    assert sorted(out.k) == [1, 2]


def test_grouped_quantile_sample_skips_null_values(ray_session):
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_quantile_sample

    rows = ([{"g": "a", "rid": i, "v": float(i % 7)} for i in range(200)]
            + [{"g": "a", "rid": 1000 + i, "v": None} for i in range(50)])
    res = grouped_quantile_sample(
        rd.from_items(rows), group_column="g", value_column="v",
        key_column="rid", qs=(0.9,), m=256).to_pandas()
    assert not np.isnan(float(res.q90.iloc[0]))


def test_grouped_top_k_rejects_null_order(ray_session):
    import ray.data as rd
    from trinity_ray.ops.relational import grouped_top_k

    ds = rd.from_items([{"g": "a", "v": 1, "id": 0},
                        {"g": "a", "v": None, "id": 1}])
    with pytest.raises(Exception, match="non-null order"):
        grouped_top_k(ds, group_column="g", order_column="v", k=1,
                      tie_column="id").to_pandas()


def test_range_count_join_left_column_named_sum_cents(ray_session):
    """A left payload named 'sum_cents' must survive when the sum channel
    is disabled (the internal default name must not shadow it)."""
    import ray.data as rd
    from trinity_ray.ops.relational import range_count_join

    t = T0 + dt.timedelta(seconds=50)
    left = rd.from_items([{"sum_cents": 77, "ts": t, "user_id": 1}])
    right = rd.from_items(
        [{"ts": t - dt.timedelta(seconds=5), "user_id": 1}])
    res = range_count_join(left, right, key_column="user_id",
                           ts_column="ts", left_columns=("sum_cents",),
                           window_s=10).to_pandas()
    assert int(res.sum_cents[0]) == 77 and int(res.n_in_window[0]) == 1


def test_retention_cohorts_hand_worked(ray_session):
    import ray.data as rd

    from trinity_ray.ops.window import retention_cohorts

    WEEK = 7 * 86400
    rows = [
        # user 1: weeks 0, 1, 3  -> cohort 0, offsets 0/1/3
        (1, 0), (1, 1), (1, WEEK + 5), (1, 3 * WEEK),
        # user 2: weeks 1, 1, 2  -> cohort 1, offsets 0/1 (dup week dedups)
        (2, WEEK), (2, WEEK + 9), (2, 2 * WEEK),
        # user 3: week 3 only    -> cohort 3, offset 0
        (3, 3 * WEEK),
    ]
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([s * 1_000_000 for _, s in rows],
                       pa.timestamp("us")),
    })
    # user 1's week-3 activity lands in cohort 0 at offset 3; cohort 3
    # holds only user 3 (whose first week IS 3)
    want = {(0, 0): 1, (0, 1): 1, (0, 3): 1,
            (1, 0): 1, (1, 1): 1, (3, 0): 1}
    got = retention_cohorts(rd.from_arrow(t)).to_pandas()
    got_map = {(int(r.cohort), int(r.period_offset)): int(r.n_users)
               for r in got.itertuples()}
    assert got_map == want
    # partition independence (cross-batch (user, week) dups must dedup)
    got16 = retention_cohorts(rd.from_arrow(t).repartition(6)).to_pandas()
    got16_map = {(int(r.cohort), int(r.period_offset)): int(r.n_users)
                 for r in got16.itertuples()}
    assert got16_map == want


def test_retention_cohorts_random_vs_duckdb(ray_session):
    import duckdb

    import ray.data as rd

    from trinity_ray.ops.window import retention_cohorts

    rng = np.random.RandomState(11)
    n = 2000
    t = pa.table({
        "user_id": pa.array(rng.randint(0, 80, n), pa.int64()),
        "ts": pa.array(rng.randint(0, 90 * 86400, n) * 1_000_000,
                       pa.timestamp("us")),
    })
    got = retention_cohorts(rd.from_arrow(t).repartition(9)
                            ).to_pandas().sort_values(
        ["cohort", "period_offset"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("ev", t)
    want = con.sql("""
        WITH p AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 604800000000 AS period FROM ev),
        c AS (SELECT user_id, min(period) AS cohort FROM p GROUP BY user_id)
        SELECT c.cohort, p.period - c.cohort AS period_offset,
               count(*) AS n_users
        FROM p JOIN c USING (user_id) GROUP BY 1, 2
        ORDER BY 1, 2""").df()
    assert got["cohort"].tolist() == want["cohort"].tolist()
    assert got["period_offset"].tolist() == want["period_offset"].tolist()
    assert got["n_users"].tolist() == want["n_users"].tolist()


def test_retention_cohorts_string_user_ids(ray_session):
    import ray.data as rd

    from trinity_ray.ops.window import retention_cohorts

    WEEK = 7 * 86400
    t = pa.table({
        "user_id": pa.array(["alice", "alice", "bob", "alice"]),
        "ts": pa.array([0, WEEK * 1_000_000, WEEK * 1_000_000,
                        WEEK * 1_000_000 + 5], pa.timestamp("us")),
    })
    got = retention_cohorts(rd.from_arrow(t).repartition(3)).to_pandas()
    got_map = {(int(r.cohort), int(r.period_offset)): int(r.n_users)
               for r in got.itertuples()}
    # alice: weeks 0,1 (dup week-1 rows dedup); bob: week 1 only
    assert got_map == {(0, 0): 1, (0, 1): 1, (1, 0): 1}
