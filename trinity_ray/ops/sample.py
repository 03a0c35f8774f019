"""Deterministic corpus sampling: hash-gated row selection that is stable
across runs, resumable, and exactly reproducible in SQL.

Training-data pipelines need samples that (a) do not depend on row order or
partitioning — a re-run over re-sharded input must pick the SAME rows —
and (b) can be stratified (per-language / per-source quotas).  Both are
expressed as a pure per-row predicate on a keyed hash, so selection is a
stateless ``map_batches`` filter: no shuffle, no coordination, no RNG
state.  Two hash backends:

* ``method="md5"`` — ``md5(str(key) + salt)`` compared against a 128-bit
  threshold.  Exactly reproducible in DuckDB (``md5(CAST(k AS VARCHAR) ||
  salt)``), so sampling entries are oracle-hash-checkable.  Python-loop
  per row (hashlib), fine for the driver-entry scale; cost is one md5 per
  row regardless of text size.
* ``method="splitmix"`` — splitmix64 over the integer key, fully
  vectorized in numpy; the 100-TB path.  Same statistical behavior, not
  SQL-expressible (rows-only check).

Rates are exact fractions ``(num, den)`` — floats would make the
threshold ambiguous between Python and SQL.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

import numpy as np
import pyarrow as pa

__all__ = ["sample_by_hash", "stratified_sample", "sample_exact_k",
           "epoch_shuffle", "upsample", "mixture_weights",
           "md5_threshold_hex", "md5_rank_hex", "md5_rank_list", "splitmix64"]

_MD5_SPACE = 1 << 128


def _as_fraction(rate) -> Fraction:
    f = Fraction(*rate) if isinstance(rate, tuple) else Fraction(rate)
    if not 0 <= f <= 1:
        raise ValueError(f"rate must be in [0, 1], got {f}")
    return f


def md5_threshold_hex(rate) -> str:
    """Threshold string: keep iff md5hex < this.

    ``floor(rate * 2**128)`` as 32 lowercase hex chars — identical to the
    SQL comparison ``md5(...) < '<hex>'`` (lexicographic == numeric
    order).  Rate 1 returns ``"g"``: lexicographically above every hex
    string, so the comparison keeps ALL rows in both Python and SQL (a
    strict ``<`` against the max hash value would drop a
    probability-2^-128 row)."""
    f = _as_fraction(rate)
    if f == 1:
        return "g"
    return format(int(f.numerator * _MD5_SPACE // f.denominator), "032x")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def md5_rank_list(keys: list, salt: str) -> list:
    """md5(str(key) + salt) hex ranks as a Python list — THE shared rank
    derivation for every bottom-k / ordering selection (sample_exact_k,
    grouped_quantile_sample, epoch_shuffle): one definition so the same
    (key, salt) selects the same rows across APIs and any future change
    lands once."""
    return [hashlib.md5((str(k) + salt).encode()).hexdigest()
            for k in keys]


def md5_rank_hex(keys: list, salt: str) -> pa.Array:
    """Arrow-array form of :func:`md5_rank_list`."""
    return pa.array(md5_rank_list(keys, salt), pa.string())


def _md5_keep_mask(keys: list, salt: str, th_hex: str) -> np.ndarray:
    out = np.empty(len(keys), dtype=bool)
    for i, k in enumerate(keys):
        out[i] = hashlib.md5(
            (str(k) + salt).encode()).hexdigest() < th_hex
    return out


def sample_by_hash(ds, rate, key_column: str = "doc_id", salt: str = "",
                   method: str = "md5"):
    """Keep each row iff hash(key + salt) falls below ``rate`` of the hash
    space.  Deterministic, order/partitioning-independent, no shuffle."""
    if method == "md5":
        th = md5_threshold_hex(rate)

        def keep(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_column).to_pylist()
            return batch.filter(pa.array(_md5_keep_mask(keys, salt, th)))

    elif method == "splitmix":
        f = _as_fraction(rate)
        if f == 1:                        # keep-all: no hash can satisfy a
            return ds                     # strict < against the max value
        th64 = np.uint64(f.numerator * (1 << 64) // f.denominator)
        salt_int = np.uint64(
            int.from_bytes(hashlib.md5(salt.encode()).digest()[:8], "little"))

        def keep(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_column).to_numpy().astype(np.uint64)
            return batch.filter(pa.array(splitmix64(keys ^ salt_int) < th64))

    else:
        raise ValueError(f"unknown method {method!r}")
    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, rates: dict, strata_column: str = "lang",
                      key_column: str = "doc_id", salt: str = "",
                      default_rate=(0, 1)):
    """Per-stratum deterministic sampling: row kept iff its md5-hash falls
    below its stratum's rate (strata absent from ``rates`` use
    ``default_rate``).  The rates table is tiny and rides inside the task
    closure — no broadcast or join; still one stateless streaming pass."""
    ths = {s: md5_threshold_hex(r) for s, r in rates.items()}
    th_default = md5_threshold_hex(default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        strata = batch.column(strata_column).to_pylist()
        mask = np.empty(len(keys), dtype=bool)
        for i, (k, s) in enumerate(zip(keys, strata)):
            mask[i] = hashlib.md5((str(k) + salt).encode()).hexdigest() \
                < ths.get(s, th_default)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_exact_k(ds, k: int, key_column: str = "doc_id",
                   salt: str = "", columns: tuple[str, ...] = ()):
    """EXACT-size deterministic uniform sample: the k rows with the
    smallest ``md5(str(key) + salt)`` — a bottom-k sketch, so unlike the
    rate-based :func:`sample_by_hash` the output size is exactly ``k``
    (not binomial), while keeping every property that matters at scale:
    order/partitioning independence, resumable reruns picking the SAME
    rows, and SQL reproducibility (``ORDER BY md5(...) LIMIT k``).

    Distributed shape: bottom-k is a mergeable summary — each block
    reduces to its local bottom-k (ops/relational.grouped_top_k with a
    constant group), and only k x blocks candidate rows reach the final
    merge; no full sort, no full shuffle."""
    from trinity_ray.ops.relational import grouped_top_k

    keep = tuple(columns) if columns else tuple(ds.schema().names)
    if key_column not in keep:
        keep = (key_column, *keep)

    def rank(batch: pa.Table) -> pa.Table:
        ks = batch.column(key_column).to_pylist()
        cols = {c: batch.column(c) for c in keep}
        cols["_h"] = md5_rank_hex(ks, salt)
        cols["_grp"] = pa.array(np.zeros(batch.num_rows, np.int8))
        return pa.table(cols)

    out = grouped_top_k(ds.map_batches(rank, batch_format="pyarrow"),
                        group_column="_grp", order_column="_h", k=k,
                        descending=False, tie_column=key_column,
                        columns=keep)
    return out.drop_columns(["_grp", "_h"])


def epoch_shuffle(ds, *, seed: str = "", key_column: str = "doc_id",
                  prefix_len: int = 2):
    """Deterministic epoch permutation: global shuffle positions
    ``pos = rank of md5(str(key) + seed)`` — the standard "different
    epoch, different but reproducible order" for training loaders.
    Output rows: ``(pos, <key_column>)``; a loader sorts or joins by
    ``pos``.  Exactly reproducible in SQL (``row_number() OVER (ORDER BY
    md5(...), key) - 1``).

    Distributed shape — hash ranks are uniform, so global rank is a
    two-pass prefix sum over hex-prefix ranges (16**prefix_len of them):
    per-range counts (one row per RANGE, not per row) reach the driver
    for the exclusive prefix sum; each range then sorts locally and adds
    its broadcast offset.  No global sort of the corpus, group size is
    n/16**prefix_len in expectation (raise ``prefix_len`` for bigger
    corpora)."""
    import ray

    if prefix_len < 1 or prefix_len > 8:
        raise ValueError("prefix_len must be in 1..8")

    def ranks(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column)
        hs = md5_rank_list(keys.to_pylist(), seed)
        rid = pa.array([int(h[:prefix_len], 16) for h in hs], pa.int64())
        return pa.table({key_column: keys,
                         "_h": pa.array(hs, pa.string()), "_rid": rid})

    # two consumers (range counts + the ranking groupby) — materialize the
    # reduced (key, hash, range) projection so hashing runs once
    from trinity_ray.rayutil import (exclusive_prefix_offsets,
                                     package_runtime_env)

    ranked = ds.map_batches(ranks, batch_format="pyarrow",
                            runtime_env=package_runtime_env()).materialize()
    offsets = exclusive_prefix_offsets(
        ranked.groupby("_rid").count().to_pandas(), "_rid", "count()")
    off_ref = ray.put(offsets)

    def rank_group(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        hs = np.asarray(group.column("_h").to_pylist())
        keys = group.column(key_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, hs))        # ties (never, for md5) by key
        rid = int(group.column("_rid")[0].as_py())
        pos = int(offs[rid]) + np.arange(len(hs), dtype=np.int64)
        return pa.table({
            "pos": pa.array(pos, pa.int64()),
            key_column: group.column(key_column).take(pa.array(order)),
        })

    return ranked.groupby("_rid").map_groups(rank_group,
                                             batch_format="pyarrow")


def _repeat_rows(batch: pa.Table, r: np.ndarray, key_column: str,
                 keep: tuple) -> pa.Table:
    """Expand each batch row into ``r[i]`` copies with a ``repeat_idx``
    column — the shared kernel of :func:`upsample` and
    :func:`mixture_weights`."""
    tot = int(r.sum())
    base = np.concatenate(([0], np.cumsum(r[:-1], dtype=np.int64)))
    ridx = np.arange(tot, dtype=np.int64) - np.repeat(base, r)
    gather = pa.array(np.repeat(np.arange(len(r), dtype=np.int64), r))
    out = {key_column: batch.column(key_column).take(gather),
           "repeat_idx": pa.array(ridx, pa.int64())}
    for c in keep:
        out[c] = batch.column(c).take(gather)
    return pa.table(out)


def _empty_repeat(batch: pa.Table, key_column: str, keep: tuple) -> pa.Table:
    return pa.table({key_column: batch.column(key_column),
                     "repeat_idx": pa.array([], pa.int64()),
                     **{c: batch.column(c) for c in keep}})


def upsample(ds, factor, *, key_column: str = "doc_id", salt: str = "",
             columns: tuple[str, ...] = ()):
    """Deterministic fractional repetition — domain/source upweighting.

    Each row is emitted ``floor(factor)`` times, plus once more iff
    ``md5(str(key) + salt)`` falls below the fractional part of
    ``factor`` — so a corpus upweighted 2.5x repeats every row twice and
    a deterministic, order/partitioning-independent half of the rows a
    third time.  ``factor`` is an exact fraction ``(num, den)`` or a
    Fraction-able value >= 0; rows selected are SQL-reproducible like
    :func:`sample_by_hash` (a factor < 1 is a plain subsample).

    Output: ``(<key_column>, repeat_idx, *columns)`` with ``repeat_idx``
    in ``0..r-1`` — downstream packing/shuffling treats repeats as
    distinct rows.  Stateless ``map_batches``; no shuffle."""
    f = Fraction(*factor) if isinstance(factor, tuple) else Fraction(factor)
    if f < 0:
        raise ValueError(f"factor must be >= 0, got {f}")
    whole = int(f)
    frac = f - whole
    th = md5_threshold_hex(frac)
    keep = tuple(columns)

    def rep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        if not keys:                     # 0-row block (e.g. post-filter)
            return _empty_repeat(batch, key_column, keep)
        r = np.full(len(keys), whole, np.int64)
        if frac > 0:
            r += _md5_keep_mask(keys, salt, th)
        return _repeat_rows(batch, r, key_column, keep)

    from trinity_ray.rayutil import package_runtime_env

    return ds.map_batches(rep, batch_format="pyarrow",
                          runtime_env=package_runtime_env())


def mixture_weights(ds, weights: dict, *, strata_column: str = "lang",
                    key_column: str = "doc_id", salt: str = "",
                    default_weight=(1, 1), columns: tuple[str, ...] = ()):
    """Deterministic corpus mixing — per-domain reweighting in one pass.

    Each row's stratum (language / source / domain) maps to a weight:
    the row is emitted ``floor(w)`` times plus once more iff
    ``md5(str(key) + salt)`` falls below ``w``'s fractional part.  Weights
    above 1 upsample a rare domain, below 1 subsample a common one — the
    standard "data mixture" knob when composing a training corpus from
    heterogeneous sources, unifying :func:`stratified_sample` (all w <= 1)
    and :func:`upsample` (one global w).  Weights are exact fractions
    ``(num, den)``; strata absent from ``weights`` use ``default_weight``.

    Output: ``(<key_column>, repeat_idx, *columns)``; deterministic,
    order/partitioning-independent, SQL-reproducible, stateless
    ``map_batches`` — the weights table rides in the task closure, no
    shuffle."""
    def parts(w):
        f = Fraction(*w) if isinstance(w, tuple) else Fraction(w)
        if f < 0:
            raise ValueError(f"weight must be >= 0, got {f}")
        frac = f - int(f)
        # None threshold = integer weight: no md5 needed for those rows
        return int(f), (md5_threshold_hex(frac) if frac > 0 else None)

    table = {s: parts(w) for s, w in weights.items()}
    default = parts(default_weight)
    keep = tuple(columns)

    def rep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        if not keys:                     # 0-row block (e.g. post-filter)
            return _empty_repeat(batch, key_column, keep)
        strata = batch.column(strata_column).to_pylist()
        r = np.empty(len(keys), np.int64)
        for i, (k, s) in enumerate(zip(keys, strata)):
            whole, th = table.get(s, default)
            # md5 only where the stratum HAS a fractional part (integer
            # weights — including the default 1 — skip hashing entirely)
            r[i] = whole + (th is not None and hashlib.md5(
                (str(k) + salt).encode()).hexdigest() < th)
        return _repeat_rows(batch, r, key_column, keep)

    from trinity_ray.rayutil import package_runtime_env

    return ds.map_batches(rep, batch_format="pyarrow",
                          runtime_env=package_runtime_env())


def budget_trim(ds, budget: int, *, score_column: str,
                weight_column: str, id_column: str = "doc_id"):
    """Global token-budget selection: keep rows in DESCENDING
    ``score_column`` order (ties by ascending id) while the running sum of
    ``weight_column`` stays within ``budget`` — "take the best documents
    until N tokens", the terminal step of mixing corpora under a token
    budget.  Scores must be integers (exact bucketing); weights are
    integer token counts.  Output: ``(<id_column>, <weight_column>,
    cum_weight)`` for every KEPT row, where ``cum_weight`` is the
    inclusive running sum — replayable in SQL as ``SUM(w) OVER (ORDER BY
    score DESC, id) <= budget``.

    Distributed shape (the epoch_shuffle two-pass prefix sum, over the
    score domain instead of hash ranges): per-score-bucket weight totals
    (one row per DISTINCT score) reach the driver for the exclusive
    prefix sum; each bucket then orders locally by id and adds its
    broadcast offset.  No global sort; buckets holding one score value
    each make cross-bucket order exact.  A corpus where most rows share
    one score value makes that bucket a hot groupby key — pre-bin scores
    upstream if that happens."""
    import ray

    from trinity_ray.rayutil import (exclusive_prefix_offsets,
                                     package_runtime_env)

    def tag(batch: pa.Table) -> pa.Table:
        s = batch.column(score_column).to_numpy(zero_copy_only=False)
        if not np.issubdtype(s.dtype, np.integer):
            raise TypeError(f"{score_column} must be integer-typed for "
                            f"exact bucketing; bin it upstream")
        return pa.table({
            id_column: batch.column(id_column),
            weight_column: batch.column(weight_column),
            # ascending _rid == descending score
            "_rid": pa.array(-s.astype(np.int64), pa.int64()),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            runtime_env=package_runtime_env()).materialize()
    from ray.data.aggregate import Sum

    totals = tagged.groupby("_rid").aggregate(
        Sum(weight_column, alias_name="_w")).to_pandas()
    offsets = exclusive_prefix_offsets(totals, "_rid", "_w")
    off_ref = ray.put(offsets)

    def trim(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        rid = int(group.column("_rid")[0].as_py())
        ids = group.column(id_column).to_numpy(zero_copy_only=False
                                               ).astype(np.int64)
        w = group.column(weight_column).to_numpy(zero_copy_only=False
                                                 ).astype(np.int64)
        order = np.argsort(ids, kind="stable")   # one score per bucket
        cum = int(offs[rid]) + np.cumsum(w[order])
        keep = cum <= budget
        return pa.table({
            id_column: pa.array(ids[order][keep], pa.int64()),
            weight_column: pa.array(w[order][keep], pa.int64()),
            "cum_weight": pa.array(cum[keep], pa.int64()),
        })

    return tagged.groupby("_rid").map_groups(
        trim, batch_format="pyarrow", runtime_env=package_runtime_env())
