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
           "md5_threshold_hex", "md5_rank_hex", "splitmix64"]

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


def md5_rank_hex(keys: list, salt: str) -> pa.Array:
    """md5(str(key) + salt) hex ranks — THE shared rank derivation for
    every bottom-k selection (sample_exact_k, grouped_quantile_sample):
    one definition so the same (key, salt) selects the same rows across
    APIs and any future change lands once."""
    return pa.array([hashlib.md5((str(k) + salt).encode()).hexdigest()
                     for k in keys], pa.string())


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
