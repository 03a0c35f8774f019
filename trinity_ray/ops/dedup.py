"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the part that matters at 100 TB):

- exact: hash column added in map_batches (vectorized), then ONE
  groupby(hash) shuffle of (hash, id) pairs only — content never moves.
- MinHash+LSH: per-batch shingling + 64-perm minhash (numpy), explode to
  (band, band_hash, doc_id) rows — the only shuffled payload — then
  groupby on the band key, candidate pairs inside each bucket, Jaccard
  verification against broadcast shingle sketches.  Bucket fan-in is
  bounded by collisions, not corpus size; hot buckets (boilerplate docs)
  are capped per-bucket with a documented pair budget.
- SimHash: 64-bit sketch per doc; Hamming<=k neighbor blocking via 4-band
  exact-match buckets (pigeonhole: hamming<=3 ⇒ at least one of 4 16-bit
  bands equal).
- embedding cosine: normalized vectors; candidate pairs via random
  hyperplane LSH buckets, verified by exact dot product.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from trinity_ray.rayutil import actor_pool, package_runtime_env
from trinity_ray.tokenizer import get_tokenizer

from trinity_ray.tokenizer import WORD_RE as _WORD_RE  # one shared oracle-parity pattern


def _clear_export_dir(path: str) -> None:
    """Delete ``path`` only if it looks like a prior signature/bucket export
    (absent, empty, or containing only ``*.parquet`` files / ``*.crc``
    sidecars).  A misconfigured export dir pointing at unrelated data must
    raise, not be silently destroyed (mirrors export_curated's
    foreign-entry refusal in pipelines/export.py:42-52)."""
    import os
    import shutil

    if not os.path.isdir(path):
        return
    foreign = [e for e in os.listdir(path)
               if not e.endswith((".parquet", ".crc"))]
    if foreign:
        raise RuntimeError(
            f"export dir {path!r} exists and does not look like a prior "
            f"export (unexpected entries: {foreign[:5]}); refusing to "
            f"delete it")
    shutil.rmtree(path)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(ds, text_column: str = "text", algo: str = "md5"):
    """Vectorized-ish content hash column (md5 matches DuckDB's md5())."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        fn = getattr(hashlib, algo)
        hs = [fn((t or "").encode()).hexdigest()
              for t in batch.column(text_column).to_pylist()]
        return batch.append_column("content_hash", pa.array(hs, pa.string()))

    return ds.map_batches(hash_batch, batch_format="pyarrow")


def exact_dedup(ds, id_column: str = "doc_id", text_column: str = "text",
                num_partitions: int = 16, broadcast_max_losers: int = 5_000_000):
    """Keep the lowest-id doc per identical content; returns the deduped
    Dataset (all columns, winners only).

    Winner selection is a native hash aggregate (partial Min/Count per
    block, then one small shuffle of (hash, partials) — NOT per-group
    Python).  The duplicate *losers* are usually a small minority, so the
    default elimination path broadcasts the loser-id set once (ray.put) and
    anti-filters the corpus with a vectorized np.isin — no second
    all-to-all.  Corpora with more than ``broadcast_max_losers`` duplicates
    (degenerate boilerplate) fall back to a hash-partitioned semi-join on
    (content_hash, keeper id).
    """
    import ray
    from ray.data.aggregate import Count, Min

    hashed = add_content_hash(ds, text_column)
    groups = hashed.groupby("content_hash").aggregate(
        Min(id_column, alias_name=id_column), Count(alias_name="n_docs"))
    dup_groups = groups.filter(expr="n_docs >= 2")
    n_losers = 0
    dup_batches = []
    for b in dup_groups.iter_batches(batch_format="pyarrow", batch_size=65536):
        dup_batches.append(b)
        n_losers += int(pc.sum(b.column("n_docs")).as_py() or 0) - b.num_rows
        if n_losers > broadcast_max_losers:
            break
    if n_losers > broadcast_max_losers:  # scale fallback: semi-join winners
        winners = groups.select_columns(["content_hash", id_column])
        return hashed.join(winners, "inner", num_partitions=num_partitions,
                           on=("content_hash", id_column),
                           ).drop_columns(["content_hash"])
    if n_losers == 0:
        return ds
    # broadcast the (dup hash -> keeper id) table once; losers are dropped
    # INSIDE map_batches with vectorized pc.index_in — the corpus never
    # transits the driver (the dup table is bounded by broadcast_max_losers)
    dup_tbl = pa.concat_tables(dup_batches).combine_chunks()
    dup_ref = ray.put(dup_tbl)

    def drop_losers(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        pos = pc.index_in(batch.column("content_hash"),
                          value_set=dup.column("content_hash"))
        valid = pos.is_valid().to_numpy(zero_copy_only=False)
        if not valid.any():
            return batch.drop_columns(["content_hash"])
        keepers = dup.column(id_column).to_numpy()
        ids = batch.column(id_column).to_numpy()
        idx = pos.fill_null(0).to_numpy(zero_copy_only=False)
        keep = ~valid | (keepers[idx] == ids)
        return batch.filter(pa.array(keep)).drop_columns(["content_hash"])

    return hashed.map_batches(drop_losers, batch_format="pyarrow",
                              runtime_env=package_runtime_env())


def exact_dup_groups(ds, id_column: str = "doc_id", text_column: str = "text"):
    """(content_hash, keeper, n_dups) per distinct content — the SQL-checkable
    summary of exact dedup.  Pure native aggregate: Ray pre-aggregates
    per block map-side, then shuffles only (hash, partial) rows."""
    from ray.data.aggregate import Count, Min

    hashed = add_content_hash(ds, text_column).select_columns(
        ["content_hash", id_column])
    return hashed.groupby("content_hash").aggregate(
        Min(id_column, alias_name="keeper"),
        Count(alias_name="n_docs"))


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

_TOKEN_CACHE: dict[str, int] = {}
_TOKEN_CACHE_MAX = 1_000_000
_SHINGLE_A = np.uint64(0x9E3779B97F4A7C15)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit token hashes, memoized per process/actor (tokens repeat
    heavily, so the blake2b cost amortizes to once per distinct token)."""
    if len(_TOKEN_CACHE) > _TOKEN_CACHE_MAX:
        _TOKEN_CACHE.clear()
    out = np.empty(len(tokens), dtype=np.uint64)
    get = _TOKEN_CACHE.get
    for i, t in enumerate(tokens):
        h = get(t)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            _TOKEN_CACHE[t] = h
        out[i] = h
    return out


def _shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    """Stable 64-bit hashes of k-token shingles: cached per-token blake2b
    combined by a vectorized positional polynomial (uint64 wraparound) —
    k numpy passes instead of one blake2b per shingle."""
    th = _token_hashes(tokens)
    if th.size == 0:
        return th
    if th.size < k:
        acc = np.zeros(1, dtype=np.uint64)
        for v in th:
            acc = acc * _SHINGLE_A + v
        return acc
    n = th.size - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = acc * _SHINGLE_A + th[j:j + n]
    return np.unique(acc)


_MERSENNE = (1 << 61) - 1
# driver-combine guard for minhash bucket counting (rows of per-block
# partial counts); above this the native hash aggregate takes over
PARTIAL_COUNT_MAX = 5_000_000


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer with the golden-ratio increment folded in,
    vectorized over a uint64 array (wraparound is the modulus).  Quality
    is ample for LSH bucketing keys.  The core permutation is ONE shared
    definition (ops.sketch._mix64) so the HLL and LSH paths cannot
    silently diverge; output values here are unchanged from r4."""
    from trinity_ray.ops.sketch import _mix64 as _splitmix64

    return _splitmix64(x + np.uint64(0x9E3779B97F4A7C15))


class MinHasher:
    """num_perm universal-hash minhash over k-token shingles."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 text_column: str = "text", id_column: str = "doc_id",
                 tokenizer: str = "simple", seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_column = text_column
        self.id_column = id_column
        self.tokenize = get_tokenizer(tokenizer)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(self.tokenize(text or ""), self.k)
        if sh.size == 0:
            return np.full(self.num_perm, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        # (P, S) affine hash with uint64 wraparound (deterministic, fully
        # vectorized; the wrap plays the role of the modulus)
        phv = self.a[:, None] * sh[None, :] + self.b[:, None]
        return phv.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column(self.text_column).to_pylist()]
        flat = (np.concatenate(sigs) if sigs
                else np.empty(0, dtype=np.uint64))
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.uint64()), self.num_perm),
        })


def minhash_signatures(ds, *, num_perm: int = 64, shingle_k: int = 3,
                       text_column: str = "text", id_column: str = "doc_id",
                       tokenizer: str = "simple", batch_size: int = 1024,
                       concurrency: int = 8):
    # a driver-constructed instance (plain tasks), NOT an actor pool:
    # MinHasher state is a few KB (hash coefficients + compiled regex) that
    # pickles with the task, while an actor pool pays N process spawns +
    # package imports before the first batch — the dominant cost for
    # anything but giant inputs (same lesson as the index builder)
    fn = MinHasher(num_perm=num_perm, shingle_k=shingle_k,
                   text_column=text_column, id_column=id_column,
                   tokenizer=tokenizer)
    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, runtime_env=package_runtime_env(),
    )


def _hot_buckets_only(exploded, keys: list[str], max_hot: int = 2_000_000):
    """Restrict an exploded (bucket-key, member) dataset to buckets with >= 2
    members.  Bucket sizes come from a native Count aggregate (map-side
    partial + tiny shuffle); the hot-key set — near-dup buckets are a small
    fraction of all buckets — is broadcast once via ray.put and applied as a
    vectorized membership filter, avoiding a second all-to-all of the full
    exploded set.  ``max_hot`` guards the broadcast: above it (degenerate
    boilerplate corpora) fall back to returning ``exploded`` unfiltered and
    let the downstream groupby see all buckets."""
    import ray
    from ray.data.aggregate import Count

    # exploded is consumed twice (bucket count + filter); without a
    # materialize the whole upstream (per-doc signature computation) would
    # re-execute for the second pass
    exploded = exploded.materialize()
    sizes = exploded.groupby(keys).aggregate(Count(alias_name="bucket_n"))
    hot = sizes.filter(expr="bucket_n >= 2").select_columns(keys)
    hot_tbl = pa.concat_tables(
        [b for b in hot.iter_batches(batch_format="pyarrow", batch_size=65536)]
        or [pa.table({k: pa.array([], pa.int64()) for k in keys})])
    if hot_tbl.num_rows == 0:
        return exploded.limit(0)
    if hot_tbl.num_rows > max_hot:
        return exploded
    hot_keys = ray.put(np.unique(_pack_keys(hot_tbl, keys)))

    def keep(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_keys)
        mask = np.isin(_pack_keys(batch, keys), hk, assume_unique=False)
        return batch.filter(pa.array(mask))

    return exploded.map_batches(keep, batch_format="pyarrow",
                                runtime_env=package_runtime_env())


def _pack_keys(tbl: pa.Table, keys: list[str]) -> np.ndarray:
    """Pack composite bucket keys into one uint64 per row for np.isin."""
    acc = np.zeros(tbl.num_rows, dtype=np.uint64)
    for k in keys:
        col = tbl.column(k).to_numpy().astype(np.uint64)
        acc = (acc * np.uint64(0x9E3779B97F4A7C15)) ^ col
    return acc


def minhash_lsh_pairs(ds, *, num_perm: int = 64, bands: int = 8,
                      threshold: float = 0.5, shingle_k: int = 3,
                      text_column: str = "text", id_column: str = "doc_id",
                      tokenizer: str = "simple", max_bucket: int = 200,
                      concurrency: int = 8, export_dir: str | None = None):
    """Candidate near-dup pairs via banded MinHash LSH, verified by the
    estimated Jaccard (fraction of equal minhash components).

    Returns a Dataset of (id_a, id_b, est_jaccard) with id_a < id_b.
    ``max_bucket`` caps pair explosion in degenerate buckets (boilerplate):
    buckets larger than the cap are truncated and counted, not silently
    dropped — at scale you'd split them by a secondary band.

    ``export_dir``: optionally persist the signatures
    (``<export_dir>/sigs``: id, minhash list<int64>) and band rows
    (``<export_dir>/bands``: band, band_hash, id) as Parquet so an oracle
    can re-derive the pairs (band self-join + component-equality estimate)
    independently of the engine's shuffle strategy.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    import ray
    from ray.data.aggregate import Count

    # signatures are computed ONCE and pinned (512 B/doc at the defaults —
    # a small fraction of corpus bytes; at PB scale checkpoint this stage to
    # Parquet instead so reruns and the two passes below read, not recompute)
    sigs = minhash_signatures(ds, num_perm=num_perm, shingle_k=shingle_k,
                              text_column=text_column, id_column=id_column,
                              tokenizer=tokenizer,
                              concurrency=concurrency).materialize()

    def explode(batch: pa.Table, with_sig: bool) -> pa.Table:
        n = batch.num_rows
        mh = batch.column("minhash").combine_chunks()
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.chunk(0) if mh.num_chunks else pa.array(
                [], pa.list_(pa.uint64(), num_perm))
        sig = mh.flatten().to_numpy(zero_copy_only=False
                                    ).astype(np.uint64).reshape(n, num_perm)
        parts = []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            # vectorized band hash: one splitmix64 mixing pass per signature
            # column — O(bands) numpy passes, not O(rows*bands) digest calls
            h = _mix64(np.full(n, b + 1, dtype=np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15))
            for c in range(rows_per_band):
                h = _mix64(h ^ chunk[:, c])
            cols = {
                "band": pa.array(np.full(n, b, dtype=np.int32), pa.int32()),
                # 63-bit int64 so the hash survives every groupby/aggregate
                # round-trip without object/pickle fallbacks
                "band_hash": pa.array(
                    (h >> np.uint64(1)).astype(np.int64), pa.int64()),
                id_column: batch.column(id_column),
            }
            if with_sig:
                cols["minhash"] = mh
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    # pass 1: bucket sizes over LIGHT rows (band, hash, id) — the full
    # signature is never replicated bands× through the shuffle.  Per-block
    # PARTIAL counts (np.unique inside map_batches) shrink each block to
    # its distinct keys; when the combined partials are small they merge on
    # the driver (no all-to-all — a groupby's fixed cost dominates at this
    # row volume), otherwise fall back to the native hash aggregate.
    keys = ["band", "band_hash"]
    light = sigs.map_batches(
        lambda b: explode(b, False), batch_format="pyarrow",
        runtime_env=package_runtime_env())
    if export_dir is not None:
        import os as _os

        for sub in ("sigs", "bands"):
            _clear_export_dir(_os.path.join(export_dir, sub))

        def sig_signed(batch: pa.Table) -> pa.Table:
            mh = batch.column("minhash").combine_chunks()
            flat = mh.flatten().to_numpy(zero_copy_only=False
                                         ).astype(np.uint64).view(np.int64)
            return pa.table({
                id_column: batch.column(id_column),
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.int64()), num_perm),
            })

        sigs.map_batches(sig_signed, batch_format="pyarrow").write_parquet(
            _os.path.join(export_dir, "sigs"))
        # the bands export AND the pass-1 counts scan both consume `light`:
        # pin the exploded rows once so the band hashing doesn't re-run
        # (cf. simhash_pairs' sigs.materialize() for the same reason)
        light = light.materialize()
        light.write_parquet(_os.path.join(export_dir, "bands"))

    def partial_counts(batch: pa.Table) -> pa.Table:
        packed = _pack_keys(batch, keys).astype(np.int64) \
            if batch.num_rows else np.empty(0, np.int64)
        # the pack is only a driver-side combine key; (band, hash) ride
        # along so hot buckets can be reported in original key space
        uniq, first_idx, cnt = np.unique(packed, return_index=True,
                                         return_counts=True)
        return pa.table({
            "band": pc.take(batch.column("band"), pa.array(first_idx)),
            "band_hash": pc.take(batch.column("band_hash"),
                                 pa.array(first_idx)),
            "packed": pa.array(uniq, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    _PARTIAL_MAX = PARTIAL_COUNT_MAX
    partial_batches = []
    n_partials = 0
    for b in light.map_batches(partial_counts, batch_format="pyarrow",
                               runtime_env=package_runtime_env()
                               ).iter_batches(batch_format="pyarrow",
                                              batch_size=262144):
        partial_batches.append(b)
        n_partials += b.num_rows
        if n_partials > _PARTIAL_MAX:
            break
    if n_partials > _PARTIAL_MAX:
        # degenerate corpus (too many distinct buckets for the driver):
        # native map-side-combining hash aggregate
        sizes = light.groupby(keys).aggregate(Count(alias_name="bucket_n"))
        hot = sizes.filter(expr="bucket_n >= 2").select_columns(keys)
        hot_tbl = pa.concat_tables(
            [b for b in hot.iter_batches(batch_format="pyarrow",
                                         batch_size=65536)]
            or [pa.table({"band": pa.array([], pa.int32()),
                          "band_hash": pa.array([], pa.int64())})])
    else:
        pt = pa.concat_tables(partial_batches) if partial_batches else \
            pa.table({"band": pa.array([], pa.int32()),
                      "band_hash": pa.array([], pa.int64()),
                      "packed": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
        packed = pt.column("packed").to_numpy()
        cnts = pt.column("cnt").to_numpy()
        uniq, inv = np.unique(packed, return_inverse=True)
        total = np.bincount(inv, weights=cnts.astype(np.float64))
        first = np.zeros(uniq.size, dtype=np.int64)
        first[inv[::-1]] = np.arange(packed.size - 1, -1, -1)
        hot_sel = first[total >= 2]
        hot_tbl = pa.table({
            "band": pc.take(pt.column("band"), pa.array(hot_sel)),
            "band_hash": pc.take(pt.column("band_hash"),
                                 pa.array(hot_sel)),
        })
    empty_pairs = pa.table({"id_a": pa.array([], pa.int64()),
                            "id_b": pa.array([], pa.int64()),
                            "est_jaccard": pa.array([], pa.float64())})
    if hot_tbl.num_rows == 0:
        import ray.data as rd

        return rd.from_arrow(empty_pairs)
    hot_keys = ray.put(np.unique(_pack_keys(hot_tbl, keys)))

    # pass 2: explode WITH signatures, keep only hot-bucket rows (a small
    # fraction of the corpus), then pair within buckets
    def keep(batch: pa.Table) -> pa.Table:
        t = explode(batch, True)
        hk = ray.get(hot_keys)
        mask = np.isin(_pack_keys(t, keys), hk, assume_unique=False)
        return t.filter(pa.array(mask))

    exploded = sigs.map_batches(keep, batch_format="pyarrow",
                                runtime_env=package_runtime_env())

    def bucket_pairs(g: pa.Table) -> pa.Table:
        # pyarrow in/out (r5): the pandas group format paid an
        # Arrow->pandas->Arrow round-trip per bucket, object-dtype id
        # columns included
        if g.num_rows < 2:
            return empty_pairs
        ids_all = g.column(id_column).to_numpy(zero_copy_only=False)
        order = np.argsort(ids_all, kind="stable")[:max_bucket]
        ids = ids_all[order].astype(np.int64)
        sig = g.column("minhash").combine_chunks().flatten() \
               .to_numpy(zero_copy_only=False).astype(np.uint64) \
               .reshape(g.num_rows, num_perm)[order]
        # row-broadcast sweep: sig[i+1:] == sig[i] compares zero-copy VIEWS
        # of the (cap, num_perm) matrix, which stays cache-resident; a
        # triangular gather (sig[triu_pairs]) materializes ~20 MB per
        # bucket and measured 5x SLOWER (BASELINE.md round-4 micro-A/B) —
        # the outer loop is <=cap iterations of pure numpy, not per-pair
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            eq = (sig[i + 1:] == sig[i]).mean(axis=1)
            sel = np.flatnonzero(eq >= threshold)
            if sel.size:
                out_a.append(np.full(sel.size, ids[i], dtype=np.int64))
                out_b.append(ids[i + 1 + sel])
                out_j.append(eq[sel])
        if not out_a:
            return empty_pairs
        return pa.table({"id_a": np.concatenate(out_a),
                         "id_b": np.concatenate(out_b),
                         "est_jaccard": np.concatenate(out_j)})

    pairs = exploded.groupby(keys).map_groups(
        bucket_pairs, batch_format="pyarrow", runtime_env=package_runtime_env())

    # dedup pairs found in multiple bands (est_jaccard is computed from the
    # full signature, so it is identical in every band: Max == the value)
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_BIT_WEIGHTS = np.uint64(1) << _BIT_SHIFTS
# byte-wise popcount lookup (vectorized popcount for uint64 arrays)
_POPCOUNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Element-wise popcount of a uint64 array (byte-table lookup)."""
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return _POPCOUNT8[b].reshape(x.shape + (8,)).sum(
        axis=-1, dtype=np.int64)


class SimHasher:
    """64-bit SimHash over token unigrams (stable blake2b token hashes).

    The whole batch is hashed as ONE flat bit matrix + per-doc prefix-sum
    slices — per-doc Python work is only the (inherent) tokenize call."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 tokenizer: str = "simple"):
        self.text_column = text_column
        self.id_column = id_column
        self.tokenize = get_tokenizer(tokenizer)

    # bound the per-chunk bit-matrix transient (~64 MB of uint8 at the
    # cap) regardless of document lengths in the batch
    _CHUNK_TOKENS = 1 << 20

    def _sigs(self, texts: list[str]) -> np.ndarray:
        tok_lists = [self.tokenize(t or "") for t in texts]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        sigs = np.zeros(len(texts), dtype=np.uint64)
        n = len(texts)
        i = 0
        while i < n:
            j, tot = i, 0                    # docs [i, j) fit the cap
            while j < n and (tot == 0 or tot + lens[j] <= self._CHUNK_TOKENS):
                tot += int(lens[j])
                j += 1
            sl = lens[i:j]
            nz = np.flatnonzero(sl)
            if nz.size:
                th = _token_hashes(
                    [t for lst in tok_lists[i:j] for t in lst])
                bits = ((th[:, None] >> _BIT_SHIFTS[None, :])
                        & np.uint64(1)).astype(np.uint8)  # (chunk_toks, 64)
                starts = np.concatenate(([0], np.cumsum(sl)))[:-1]
                # one segmented sum per non-empty doc (empty docs own a
                # zero-length span, which reduceat cannot express — they
                # keep sig 0 and their boundaries fold into neighbors')
                sums = np.add.reduceat(bits, starts[nz], axis=0,
                                       dtype=np.int64)
                pos = (2 * sums - sl[nz][:, None]) > 0
                sigs[i + nz] = np.where(
                    pos, _BIT_WEIGHTS[None, :], np.uint64(0)
                ).sum(axis=1, dtype=np.uint64)
            i = j
        return sigs

    def simhash(self, text: str) -> int:
        return int(self._sigs([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self._sigs(batch.column(self.text_column).to_pylist())
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "simhash": pa.array(sigs, pa.uint64()),
        })


def simhash_pairs(ds, *, max_hamming: int = 3, text_column: str = "text",
                  id_column: str = "doc_id", tokenizer: str = "simple",
                  max_bucket: int = 500, concurrency: int = 8,
                  sig_export_dir: str | None = None):
    """Near-dup pairs with Hamming distance <= max_hamming, blocked by 4
    16-bit bands (pigeonhole: <=3 differing bits ⇒ >=1 identical band —
    for max_hamming <= 3 the banding is candidate-complete up to the
    per-bucket cap, so the result is EXACT all-pairs).

    ``sig_export_dir``: optionally persist (id, sig int64) signatures as
    Parquet — an oracle can then brute-force bit_count(xor) <= max_hamming
    over the export to verify the banded result."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(
            text_column=text_column, id_column=id_column, tokenizer=tokenizer),
        batch_format="pyarrow", concurrency=actor_pool(concurrency), batch_size=1024,
        runtime_env=package_runtime_env(),
    )
    if sig_export_dir is not None:
        sigs = sigs.materialize()  # consumed twice: export + banding
        _clear_export_dir(sig_export_dir)

        def to_signed(batch: pa.Table) -> pa.Table:
            sh = batch.column("simhash").to_numpy().astype(np.uint64)
            return pa.table({
                id_column: batch.column(id_column),
                "sig": pa.array(sh.view(np.int64), pa.int64()),
            })

        sigs.map_batches(to_signed, batch_format="pyarrow").write_parquet(
            sig_export_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy()
        sh = batch.column("simhash").to_numpy()
        parts = []
        for b in range(4):
            band_val = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            parts.append(pa.table({
                "band": pa.array(np.full(len(ids), b, np.int32)),
                "band_val": pa.array(band_val, pa.uint32()),
                id_column: pa.array(ids),
                "simhash": pa.array(sh, pa.uint64()),
            }))
        return pa.concat_tables(parts)

    exploded = sigs.map_batches(explode, batch_format="pyarrow",
                                runtime_env=package_runtime_env())

    empty_pairs = pa.table({"id_a": pa.array([], pa.int64()),
                            "id_b": pa.array([], pa.int64()),
                            "hamming": pa.array([], pa.int64())})

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return empty_pairs
        ids_all = g.column(id_column).to_numpy(zero_copy_only=False)
        order = np.argsort(ids_all, kind="stable")[:max_bucket]
        ids = ids_all[order].astype(np.int64)
        sh = g.column("simhash").to_numpy(zero_copy_only=False
                                          ).astype(np.uint64)[order]
        # triangular broadcast: buckets are capped, so the all-pairs XOR
        # matrix is bounded (~125k pairs at the default cap)
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = _popcount64(sh[ia] ^ sh[ib])
        sel = ham <= max_hamming
        return pa.table({"id_a": ids[ia[sel]],
                         "id_b": ids[ib[sel]],
                         "hamming": ham[sel].astype(np.int64)})

    hot = _hot_buckets_only(exploded, ["band", "band_val"])
    pairs = hot.groupby(["band", "band_val"]).map_groups(
        bucket_pairs, batch_format="pyarrow", runtime_env=package_runtime_env())

    # dedup pairs found via multiple bands (hamming identical everywhere)
    from ray.data.aggregate import Min

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for verification / small candidate sets)
# ---------------------------------------------------------------------------

def ngram_jaccard(text_a: str, text_b: str, k: int = 3,
                  tokenizer: str = "simple") -> float:
    tok = get_tokenizer(tokenizer)
    a = _shingle_hashes(tok(text_a or ""), k)
    b = _shingle_hashes(tok(text_b or ""), k)
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / float(a.size + b.size - inter)


def _verify_pairs_jaccard_join(pairs_ds, docs_ds, *, k: int,
                               text_column: str, id_column: str,
                               tokenizer: str, threshold: float,
                               n_pairs: int) -> pd.DataFrame:
    """Distributed verify path for huge candidate sets: shingle-hash every
    doc ONCE into a sorted-unique int64 list column, then two hash joins
    attach each pair side's shingle set — the corpus text never reaches
    the driver and no per-task broadcast dict exists.  Shuffled payload is
    (id, shingles) for docs that appear in candidates plus the pair rows
    themselves; exactness (and the jaccard formula) is identical to the
    broadcast path."""

    def shingle(batch: pa.Table) -> pa.Table:
        tok = get_tokenizer(tokenizer)
        # one binary blob of little-endian uint64s per doc: Acero's hash
        # join (Ray's join aggregator) rejects list-typed payload columns,
        # and a blob round-trips through np.frombuffer zero-copy anyway
        shs = [_shingle_hashes(tok(t or ""), k).tobytes()
               for t in batch.column(text_column).to_pylist()]
        return pa.table({
            id_column: batch.column(id_column),
            "sh": pa.array(shs, pa.binary()),
        })

    # restrict the corpus to ids that can ever match BEFORE shingling:
    # only ~2x n_pairs distinct candidate ids exist, so shingling (the
    # most expensive stage) and both verify joins carry candidate docs
    # only, never the whole corpus.  Fully distributed — per-block
    # distinct inside map_batches, a native hash-distinct (map-side
    # partials), then an inner semi-join; the driver never holds the ids.
    parts = int(max(2, min(64, n_pairs // 200_000 + 2)))

    def flat_ids(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        both = pa.concat_arrays([b.column("id_a").combine_chunks(),
                                 b.column("id_b").combine_chunks()])
        return pa.table({"id": pc.unique(both)})

    distinct_ids = pairs_ds.select_columns(["id_a", "id_b"]) \
        .map_batches(flat_ids, batch_format="pyarrow") \
        .groupby("id").count().select_columns(["id"])
    candidates = docs_ds.select_columns([id_column, text_column]).join(
        distinct_ids, "inner", num_partitions=parts,
        on=(id_column,), right_on=("id",))

    # materialize: doc_sh feeds BOTH joins — without pinning, the shingle
    # map (the most expensive stage at this scale) would re-run per join
    doc_sh = candidates.map_batches(
        shingle, batch_format="pyarrow",
        runtime_env=package_runtime_env()).materialize()
    # left_outer keeps pairs whose id is missing from docs (null sh ->
    # empty shingle set), matching the broadcast path's texts.get(id, "")
    j1 = pairs_ds.select_columns(["id_a", "id_b"]).join(
        doc_sh, "left_outer", num_partitions=parts,
        on=("id_a",), right_on=(id_column,))

    def rename_a(batch: pa.Table) -> pa.Table:
        # Ray's join omits the right key column when right_on differs from
        # on, but drop defensively in case that changes
        if id_column in batch.column_names:
            batch = batch.drop_columns([id_column])
        return batch.rename_columns(
            ["sh_a" if c == "sh" else c for c in batch.column_names])

    j2 = j1.map_batches(rename_a, batch_format="pyarrow").join(
        doc_sh, "left_outer", num_partitions=parts,
        on=("id_b",), right_on=(id_column,))

    def jac(batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        out_a, out_b, out_j = [], [], []
        for i, (sa, sb) in enumerate(zip(
                batch.column("sh_a").to_pylist(),
                batch.column("sh").to_pylist())):
            # null sh = id absent from docs (left_outer): empty shingle
            # set, same as the broadcast path's empty-text fallback
            a = np.frombuffer(sa or b"", dtype=np.uint64)
            b = np.frombuffer(sb or b"", dtype=np.uint64)
            if a.size == 0 and b.size == 0:
                j = 1.0
            else:
                inter = np.intersect1d(a, b, assume_unique=True).size
                j = inter / float(a.size + b.size - inter)
            if j >= threshold:
                out_a.append(int(ia[i]))
                out_b.append(int(ib[i]))
                out_j.append(j)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    res = j2.map_batches(jac, batch_format="pyarrow").to_pandas()
    # verified output is bounded by true duplicate pairs; the driver-side
    # DataFrame mirrors the broadcast path's return type
    return res[["id_a", "id_b", "jaccard"]]


def verify_pairs_jaccard(pairs_ds, docs_ds, *, k: int = 3,
                         text_column: str = "text", id_column: str = "doc_id",
                         tokenizer: str = "simple", threshold: float = 0.7,
                         broadcast_max_pairs: int = 2_000_000):
    """Exact n-gram Jaccard over candidate pairs.  The doc texts needed are
    gathered once and broadcast (candidate sets are tiny vs the corpus —
    the standard verify-side pattern).  Above ``broadcast_max_pairs``
    candidates the gather switches to :func:`_verify_pairs_jaccard_join`:
    a distributed semi-join on id that never builds a driver-side text
    dict (the at-scale path VERDICT r4 asked to make real)."""
    import ray

    # pin the candidate pipeline ONCE: count() and the downstream gather
    # (to_pandas / joins) are separate consumptions, and Ray Datasets
    # re-execute per consumption — without this the LSH shuffle runs twice
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs > broadcast_max_pairs:
        return _verify_pairs_jaccard_join(
            pairs_ds, docs_ds, k=k, text_column=text_column,
            id_column=id_column, tokenizer=tokenizer, threshold=threshold,
            n_pairs=n_pairs)
    pairs = pairs_ds.to_pandas()  # candidate pairs: small by construction
    need = np.unique(np.concatenate([
        pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()]
        ).astype(np.int64)) if len(pairs) else np.empty(0, np.int64)
    # gather only the candidate docs' texts — filtered IN the workers with a
    # broadcast id set; the corpus never reaches the driver
    need_ref = ray.put(need)

    def gather(batch: pa.Table) -> pa.Table:
        nd = ray.get(need_ref)
        ids = batch.column(id_column).to_numpy().astype(np.int64)
        return batch.filter(pa.array(np.isin(ids, nd)))

    small = pa.concat_tables(list(
        docs_ds.select_columns([id_column, text_column]).map_batches(
            gather, batch_format="pyarrow",
            runtime_env=package_runtime_env(),
        ).iter_batches(batch_format="pyarrow", batch_size=65536)) or
        [pa.table({id_column: pa.array([], pa.int64()),
                   text_column: pa.array([], pa.string())})])
    texts = dict(zip((int(i) for i in small.column(id_column).to_pylist()),
                     small.column(text_column).to_pylist()))
    ref = ray.put(texts)

    @ray.remote(runtime_env=package_runtime_env())
    def verify(chunk: pd.DataFrame):
        tx = ray.get(ref)
        out = []
        for a, b in zip(chunk["id_a"].to_numpy(), chunk["id_b"].to_numpy()):
            j = ngram_jaccard(tx.get(int(a), ""), tx.get(int(b), ""),
                              k=k, tokenizer=tokenizer)
            if j >= threshold:
                out.append((int(a), int(b), j))
        return out

    chunks = np.array_split(pairs, max(1, len(pairs) // 500)) if len(pairs) else []
    results = []
    for fut in [verify.remote(c) for c in chunks]:
        results.extend(ray.get(fut))
    return pd.DataFrame(results, columns=["id_a", "id_b", "jaccard"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(ds, *, vec_column: str = "embedding",
                        id_column: str = "vec_id", threshold: float = 0.95,
                        n_planes: int = 12, seed: int = 5,
                        max_bucket: int = 1000,
                        bucket_export_dir: str | None = None):
    """Near-duplicate pairs by cosine similarity: random-hyperplane LSH
    buckets (shuffle ships only (bucket, id, vec)), exact dot-product verify
    inside each bucket.  Vectors are L2-normalized once in the first stage.

    ``bucket_export_dir``: optionally persist (id, bucket) assignments as
    Parquet — an oracle can then re-derive the candidate pairs (same
    bucket, both within the deterministic per-bucket cap) and verify the
    engine's exact-cosine output independently (each vector lives in
    exactly ONE bucket, so candidates need no cross-band dedup)."""
    plane_cache: dict[int, np.ndarray] = {}  # per-worker; seeded => identical

    def assign(batch: pa.Table) -> pa.Table:
        vec = np.asarray(batch.column(vec_column).to_pylist(), dtype=np.float64)
        vec /= np.maximum(np.linalg.norm(vec, axis=1, keepdims=True), 1e-12)
        dim = vec.shape[1]
        planes = plane_cache.get(dim)
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
            plane_cache[dim] = planes
        bits = (vec @ planes) > 0
        bucket = np.zeros(len(vec), dtype=np.int64)
        for b in range(n_planes):
            bucket |= bits[:, b].astype(np.int64) << b
        return pa.table({
            id_column: batch.column(id_column),
            "bucket": pa.array(bucket, pa.int64()),
            "nvec": pa.array(vec.tolist(), pa.list_(pa.float64())),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow",
                              runtime_env=package_runtime_env())
    if bucket_export_dir is not None:
        assigned = assigned.materialize()  # consumed twice: export + pairs
        _clear_export_dir(bucket_export_dir)
        assigned.select_columns([id_column, "bucket"]).write_parquet(
            bucket_export_dir)

    empty_pairs = pa.table({"id_a": pa.array([], pa.int64()),
                            "id_b": pa.array([], pa.int64()),
                            "cosine": pa.array([], pa.float64())})

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return empty_pairs
        ids_all = g.column(id_column).to_numpy(zero_copy_only=False)
        order = np.argsort(ids_all, kind="stable")[:max_bucket]
        ids = ids_all[order].astype(np.int64)
        v = g.column("nvec").combine_chunks().flatten() \
             .to_numpy(zero_copy_only=False) \
             .reshape(g.num_rows, -1)[order]
        sims = v @ v.T
        iu = np.triu_indices(len(ids), k=1)
        sel = sims[iu] >= threshold
        return pa.table({
            "id_a": ids[iu[0][sel]],
            "id_b": ids[iu[1][sel]],
            "cosine": sims[iu][sel],
        })

    hot = _hot_buckets_only(assigned, ["bucket"])
    return hot.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pyarrow", runtime_env=package_runtime_env())


# ---------------------------------------------------------------------------
# near-dup clustering (connected components over candidate pairs)
# ---------------------------------------------------------------------------

def cluster_near_dups(pairs_ds, docs_ds, *, id_column: str = "doc_id"):
    """Assign every document a near-dup CLUSTER id: the minimum doc id of
    its connected component over the (id_a, id_b) pair edges — the
    keep-one-per-cluster stage every dedup pipeline ends with (keepers are
    exactly the rows where cluster == id).

    Scale shape: the pair list is bounded by construction (banded LSH with
    per-bucket caps), so union-find runs driver-side over only the edge
    ENDPOINTS; the corpus itself is swept once with a broadcast
    (node -> cluster) array via sorted membership — no shuffle, no
    whole-dataset driver materialization."""
    import ray

    pairs = pairs_ds.select_columns(["id_a", "id_b"]).to_pandas()
    if len(pairs) == 0 or "id_a" not in pairs.columns:
        # no edges (Ray may drop columns entirely on an empty dataset):
        # every doc is its own cluster
        pairs = pd.DataFrame({"id_a": [], "id_b": []})
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:          # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # union by MIN id => rep
    nodes = np.array(sorted(set(pairs["id_a"].astype(np.int64))
                            | set(pairs["id_b"].astype(np.int64))),
                     dtype=np.int64)
    reps = np.array([find(int(n)) for n in nodes], dtype=np.int64)
    keys_ref = ray.put(nodes)
    reps_ref = ray.put(reps)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy().astype(np.int64)
        keys = ray.get(keys_ref)
        rv = ray.get(reps_ref)
        cluster = ids.copy()                  # default: own component
        if keys.size:
            idx = np.searchsorted(keys, ids)
            idx_c = np.minimum(idx, keys.size - 1)
            hit = keys[idx_c] == ids
            cluster[hit] = rv[idx_c[hit]]
        return pa.table({
            id_column: pa.array(ids, pa.int64()),
            "cluster": pa.array(cluster, pa.int64()),
        })

    return docs_ds.select_columns([id_column]).map_batches(
        assign, batch_format="pyarrow", runtime_env=package_runtime_env())


def dedup_lines(ds, *, text_column: str = "text", id_column: str = "doc_id",
                min_chars: int = 4):
    """Corpus-wide line-level deduplication (the RefinedWeb/Gopher-style
    boilerplate pass): every line keeps only its FIRST occurrence across
    the whole corpus — first = lowest ``(doc id, line index)`` — and
    documents are reassembled from their surviving lines.  Lines shorter
    than ``min_chars`` characters are exempt (blank lines and trivial
    tokens are structure, not boilerplate).  Output rows:
    ``(<id_column>, text, n_kept, n_dropped)`` with ``text`` the kept
    lines re-joined by newline in original order.

    Scale shape: documents explode to (id, line_idx, line) rows in one
    stateless ``map_batches``; the group key is the line itself for
    dedup-eligible lines but a per-row unique salt for short lines, so
    the one ``groupby`` exchange never builds a hot key out of the
    billions of identical blank/short lines (the classic skew case) —
    each short line rides through as a singleton group.  First-occurrence
    marking is a per-group argmin; reassembly is a second
    ``groupby(id)``.  Both shuffles are inherent to the semantics (global
    line identity, then document identity); line text is the shuffle
    payload once, never the full document."""
    m = int(min_chars)

    _empty = pa.table({id_column: pa.array([], pa.int64()),
                       "line_idx": pa.array([], pa.int64()),
                       "line": pa.array([], pa.string()),
                       "_gk": pa.array([], pa.string())})

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:          # 0-row block (e.g. post-filter)
            return _empty
        ids = batch.column(id_column).cast(pa.int64()
                                           ).to_numpy(zero_copy_only=False)
        txt = pc.fill_null(batch.column(text_column), "")
        parts = pc.split_pattern(txt, "\n")
        lens = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(parts).combine_chunks()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.chunk(0) if flat.num_chunks else pa.array([], pa.string())
        n = len(flat)
        ids_rep = np.repeat(ids, lens)
        base = np.concatenate(([0], np.cumsum(lens[:-1], dtype=np.int64)))
        ix = np.arange(n, dtype=np.int64) - np.repeat(base, lens) + 1
        is_long = pc.greater_equal(pc.utf8_length(flat), m)
        # "L"+line groups identical long lines; short lines get a
        # collision-proof PER-DOCUMENT key (prefix disambiguates): a
        # billion blank lines never form one hot shuffle key, and the
        # group count for short lines is O(docs), not O(short lines) —
        # per-group map_groups dispatch is the cost that matters there
        sep = pa.array([""] * n, pa.string())
        gk_long = pc.binary_join_element_wise(
            pa.array(["L"] * n, pa.string()), flat, sep)
        gk_short = pc.binary_join_element_wise(
            pa.array(["S"] * n, pa.string()),
            pa.array(ids_rep.astype("U"), pa.string()), sep)
        return pa.table({id_column: pa.array(ids_rep, pa.int64()),
                         "line_idx": pa.array(ix, pa.int64()),
                         "line": flat,
                         "_gk": pc.if_else(is_long, gk_long, gk_short)})

    lines = ds.map_batches(explode, batch_format="pyarrow",
                           runtime_env=package_runtime_env())

    def mark_first(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if group.column("_gk")[0].as_py().startswith("S"):
            keep = np.ones(n, bool)               # singleton short line
        else:
            ids = group.column(id_column).to_numpy(zero_copy_only=False)
            ixs = group.column("line_idx").to_numpy(zero_copy_only=False)
            keep = np.zeros(n, bool)
            keep[np.lexsort((ixs, ids))[0]] = True
        return group.drop_columns(["_gk"]).append_column(
            "keep", pa.array(keep))

    marked = lines.groupby("_gk").map_groups(mark_first,
                                             batch_format="pyarrow")

    def reassemble(group: pa.Table) -> pa.Table:
        ixs = group.column("line_idx").to_numpy(zero_copy_only=False)
        keep = group.column("keep").to_numpy(zero_copy_only=False)
        lns = group.column("line").to_pylist()
        order = np.argsort(ixs, kind="stable")
        kept = [lns[i] for i in order if keep[i]]
        did = group.column(id_column)[0].as_py()
        return pa.table({
            id_column: pa.array([did], pa.int64()),
            "text": pa.array(["\n".join(kept)], pa.string()),
            "n_kept": pa.array([len(kept)], pa.int64()),
            "n_dropped": pa.array([len(lns) - len(kept)], pa.int64()),
        })

    return marked.groupby(id_column).map_groups(reassemble,
                                                batch_format="pyarrow")


# ---------------------------------------------------------------------------
# semantic dedup (cluster-then-prune over embeddings)
# ---------------------------------------------------------------------------

def semantic_dedup(ds, *, vec_column: str = "embedding",
                   id_column: str = "vec_id", threshold: float = 0.95,
                   n_clusters: int = 16, sample_size: int = 2048,
                   seed: int = 7, concurrency: int = 2,
                   assign_export_dir: str | None = None):
    """SemDeDup-style semantic deduplication (Abbas et al., arXiv
    2303.09540): k-means over L2-normalized embeddings, then WITHIN each
    cluster every vector whose cosine to a lower-id cluster member reaches
    ``threshold`` is marked a duplicate of the SMALLEST such id.  Returns
    ``(dup_id, keep_id, cosine)`` — the rows a curation pipeline drops;
    keepers are every id that never appears as ``dup_id``.

    Differs from :func:`embedding_dup_pairs` (LSH candidate PAIRS) in
    shape and purpose: this is the keep/drop decision itself, and the
    blocking key is a learned partition (near-dups of the same concept
    land in one cluster) rather than random hyperplanes.  Cross-cluster
    near-dups are missed by design — the paper's accepted approximation.

    Scale shape: centroids are fit ONCE on a driver-side sample
    (ann.kmeans_fit, deterministic) and broadcast to an actor-pool assign
    stage; the only shuffle is one groupby on cluster id; per-cluster work
    is O(|cluster|^2) dot products with |cluster| ~ N / n_clusters — at
    100 TB, n_clusters grows with N (the paper runs ~50k clusters for
    LAION-scale), keeping per-group cost flat, and skewed clusters are
    bounded by re-fitting with larger k, not by a silent cap.

    ``assign_export_dir``: optionally persist ``(id, cluster)`` as Parquet
    so an oracle can replay the exact keep/drop decision independently
    (the clustering is the only non-SQL-expressible stage)."""
    from trinity_ray.ops.ann import ivf_build

    _cent, assigned = ivf_build(
        ds, n_clusters=n_clusters, sample_size=sample_size,
        vec_column=vec_column, id_column=id_column, seed=seed,
        concurrency=concurrency)
    if assign_export_dir is not None:
        assigned = assigned.materialize()  # consumed twice: export + prune
        _clear_export_dir(assign_export_dir)
        assigned.select_columns([id_column, "cluster"]).write_parquet(
            assign_export_dir)

    empty = pa.table({"dup_id": pa.array([], pa.int64()),
                      "keep_id": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})

    def cluster_dups(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return empty
        ids_all = g.column(id_column).to_numpy(zero_copy_only=False)
        order = np.argsort(ids_all, kind="stable")
        ids = ids_all[order].astype(np.int64)
        v = g.column("nvec").combine_chunks().flatten() \
             .to_numpy(zero_copy_only=False).reshape(g.num_rows, -1)[order]
        sims = v @ v.T
        # per column j: the FIRST row i < j with cosine >= threshold
        m = np.triu(sims >= threshold, k=1)
        hit = m.any(axis=0)
        js = np.nonzero(hit)[0]
        if js.size == 0:
            return empty
        firsts = m[:, js].argmax(axis=0)
        return pa.table({
            "dup_id": pa.array(ids[js], pa.int64()),
            "keep_id": pa.array(ids[firsts], pa.int64()),
            "cosine": pa.array(sims[firsts, js], pa.float64()),
        })

    return assigned.groupby("cluster").map_groups(
        cluster_dups, batch_format="pyarrow",
        runtime_env=package_runtime_env())


# ---------------------------------------------------------------------------
# incremental dedup (new shard vs an existing corpus)
# ---------------------------------------------------------------------------

def dedup_against(new_ds, corpus_ds, *, text_column: str = "text",
                  id_column: str = "doc_id", prefix_chars: int = 0,
                  num_partitions: int = 8):
    """Flag rows of ``new_ds`` whose text key already exists ANYWHERE in
    ``corpus_ds`` — the incremental shape every recurring ingest needs
    (dedup the new crawl against history, not against itself).  The key
    is ``md5`` of the first ``prefix_chars`` characters (0 = the whole
    text; a small prefix catches shared boilerplate openings).  Returns
    ``(<id_column>, is_dup)`` for every new row.

    Scale shape: both sides reduce to (id, h) / distinct-h rows before
    anything moves; the corpus side collapses to ONE row per distinct key
    (groupby h), and the hash-partitioned left-outer join ships only
    hashes — never text.  At 10^12 docs the corpus key set is a persisted
    artifact re-read per ingest, not recomputed (same md5, same join)."""
    import hashlib

    def key_stage(keep_id: bool):
        def stage(batch: pa.Table) -> pa.Table:
            texts = batch.column(text_column).to_pylist()
            if prefix_chars:
                texts = [(t or "")[:prefix_chars] for t in texts]
            hs = pa.array([hashlib.md5((t or "").encode()).hexdigest()
                           for t in texts], pa.string())
            if keep_id:
                return pa.table({id_column: batch.column(id_column),
                                 "h": hs})
            return pa.table({"h": hs})
        return stage

    new_h = new_ds.map_batches(key_stage(True), batch_format="pyarrow",
                               runtime_env=package_runtime_env()
                               ).materialize()
    seen = corpus_ds.map_batches(key_stage(False), batch_format="pyarrow",
                                 runtime_env=package_runtime_env()
                                 ).groupby("h").count().materialize()
    # an empty side leaves column-less blocks that break the hash join's
    # key resolution — and with an empty corpus nothing can be a dup
    # anyway.  (Both sides are reduced hash rows; the join materializes
    # them into hash partitions regardless, so this costs nothing extra.)
    if new_h.count() == 0 or seen.count() == 0:
        def all_fresh(batch: pa.Table) -> pa.Table:
            return pa.table({
                id_column: batch.column(id_column),
                "is_dup": pa.array(np.zeros(batch.num_rows, bool)),
            })
        return new_h.map_batches(all_fresh, batch_format="pyarrow",
                                 runtime_env=package_runtime_env())
    joined = new_h.join(seen, "left_outer", num_partitions=num_partitions,
                        on=("h",))

    def flag(batch: pa.Table) -> pa.Table:
        cnt = batch.column("count()")
        return pa.table({
            id_column: batch.column(id_column),
            "is_dup": pc.is_valid(cnt),
        })

    return joined.map_batches(flag, batch_format="pyarrow",
                              runtime_env=package_runtime_env())


# ---------------------------------------------------------------------------
# cross-document duplicated token windows (ExactSubstr shape)
# ---------------------------------------------------------------------------

def dup_spans(ds, *, window: int = 8, text_column: str = "text",
              id_column: str = "doc_id", hash_method: str = "md5",
              max_group: int | None = None):
    """Every length-``window`` token span whose hash occurs in >= 2
    DISTINCT documents, reported per occurrence as ``(<id_column>,
    token_start, h)`` — the candidate-generation core of exact-substring
    dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better": duplicated >=50-token spans are removed, not whole
    docs; the reference engine has no such operator — this is part of the
    training-data layer).  Downstream span removal is a per-doc merge of
    the reported (start, start+window) intervals.

    Tokens are ``text.split(' ')`` — DuckDB ``string_split(text, ' ')``
    parity, empty tokens kept — so the entry is exactly SQL-checkable.

    hash_method:

    * ``"md5"`` — hex md5 of the space-joined window, identical to DuckDB
      ``md5(array_to_string(t[i:i+w-1], ' '))``; per-window hashlib loop,
      fine at driver-entry scale (the oracle-parity backend, same
      tradeoff as ops.sample's md5 path).
    * ``"rolling"`` — vectorized 64-bit polynomial over per-token
      splitmix hashes (numpy, zero Python per token) — the 100-TB path;
      same semantics up to 64-bit collisions (rows-only checkable).

    Scale shape: windows explode to light ``(h, id, start)`` rows in one
    stateless ``map_batches`` — the ONLY shuffle payload; document text
    never moves.  One ``groupby(h)`` then keeps groups with
    ``min(id) != max(id)`` (exactly >= 2 distinct docs).  A single
    exchange does candidate generation AND the cross-doc test — no
    second pass over the corpus, no join.  Hot windows (a license header
    duplicated across millions of files) form one group each; pass
    ``max_group`` to cap emitted occurrences per hash (lowest (id, start)
    first, deterministic) when span-level removal only needs to know the
    span is duplicated, not every site.  The cap is OFF by default so the
    oracle can replay the full output.
    """
    exploder, _empty = _span_exploder(window, text_column, id_column,
                                      hash_method)
    occ = ds.map_batches(exploder, batch_format="pyarrow",
                         runtime_env=package_runtime_env())

    cap = None if max_group is None else int(max_group)

    def cross_doc_only(group: pa.Table) -> pa.Table:
        ids = group.column(id_column)
        if group.num_rows < 2 or pc.min(ids) == pc.max(ids):
            return _empty
        if cap is not None and group.num_rows > cap:
            idv = ids.to_numpy(zero_copy_only=False)
            st = group.column("token_start").to_numpy(zero_copy_only=False)
            keep = np.lexsort((st, idv))[:cap]
            return group.take(np.sort(keep))
        return group

    return occ.groupby("h").map_groups(cross_doc_only,
                                       batch_format="pyarrow")


def _span_exploder(window: int, text_column: str, id_column: str,
                   hash_method: str):
    """Shared window-hash explode stage for :func:`dup_spans` /
    :func:`remove_dup_spans`: returns ``(fn, empty_table)`` where ``fn``
    maps a document batch to light ``(<id_column>, token_start, h)``
    occurrence rows (see dup_spans for the two hash backends)."""
    w = int(window)
    if w < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if hash_method not in ("md5", "rolling"):
        raise ValueError(f"unknown hash_method {hash_method!r}")
    use_md5 = hash_method == "md5"
    h_type = pa.string() if use_md5 else pa.int64()
    _empty = pa.table({id_column: pa.array([], pa.int64()),
                       "token_start": pa.array([], pa.int64()),
                       "h": pa.array([], h_type)})

    def explode_md5(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        ids = batch.column(id_column).cast(pa.int64()
                                           ).to_numpy(zero_copy_only=False)
        txts = pc.fill_null(batch.column(text_column), "").to_pylist()
        out_id, out_st, out_h = [], [], []
        for did, t in zip(ids, txts):
            toks = t.split(" ")
            for i in range(len(toks) - w + 1):
                out_id.append(int(did))
                out_st.append(i)
                out_h.append(hashlib.md5(
                    " ".join(toks[i:i + w]).encode()).hexdigest())
        return pa.table({id_column: pa.array(out_id, pa.int64()),
                         "token_start": pa.array(out_st, pa.int64()),
                         "h": pa.array(out_h, pa.string())})

    def explode_rolling(batch: pa.Table) -> pa.Table:
        from trinity_ray.ops.sketch import _hash64, window_poly_hashes

        if batch.num_rows == 0:
            return _empty
        ids = batch.column(id_column).cast(pa.int64()
                                           ).to_numpy(zero_copy_only=False)
        txt = pc.fill_null(batch.column(text_column), "")
        parts = pc.split_pattern(txt, " ")
        lens = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(parts).combine_chunks()
        if isinstance(flat, pa.ChunkedArray):
            flat = (flat.chunk(0) if flat.num_chunks
                    else pa.array([], pa.string()))
        th = _hash64(flat) if len(flat) else np.empty(0, np.uint64)
        # order-sensitive window polynomial ("a b" != "b a"), shared kernel
        doc_idx, local, acc = window_poly_hashes(th, lens, w)
        if doc_idx.size == 0:
            return _empty
        return pa.table({
            id_column: pa.array(ids[doc_idx], pa.int64()),
            "token_start": pa.array(local, pa.int64()),
            # 63-bit int64 (survives every groupby round-trip unsigned-safe)
            "h": pa.array((acc >> np.uint64(1)).astype(np.int64),
                          pa.int64())})

    return (explode_md5 if use_md5 else explode_rolling), _empty


def remove_dup_spans(ds, *, window: int = 8, text_column: str = "text",
                     id_column: str = "doc_id", hash_method: str = "md5",
                     join_partitions: int = 16,
                     broadcast_max_docs: int = 5_000_000):
    """Span-level exact-substring dedup (the removal step of Lee et al.
    2021): for every window hash occurring in >= 2 distinct documents,
    the occurrence with the lowest ``(doc id, token_start)`` KEEPS its
    tokens; every other occurrence's ``[start, start+window)`` token
    range is deleted from its document.  Documents are reassembled from
    surviving tokens in order.  Output rows: ``(<id_column>, text,
    n_kept, n_dropped)`` — every input document appears exactly once
    (unaffected docs pass through with n_dropped = 0).

    Same tokenization / hash backends as :func:`dup_spans` (md5 =
    SQL-oracle-exact; rolling = vectorized scale path).

    Scale shape: one explode ``map_batches`` (light occurrence rows are
    the only full-corpus shuffle payload), one ``groupby(h)`` that both
    finds cross-doc hashes and emits the non-first occurrences, one
    ``groupby(id)`` collapsing those to a per-doc drop-start list
    (bounded by the doc's own token count).  Affected docs are a small
    subset of the corpus, so the default reattach is a broadcast dict
    (``ray.put`` once, read per actor — the exact_dedup loser-set
    pattern); above ``broadcast_max_docs`` affected docs it switches to
    a hash-partitioned join so the driver never holds the map."""
    exploder, _empty = _span_exploder(window, text_column, id_column,
                                      hash_method)
    w = int(window)
    occ = ds.map_batches(exploder, batch_format="pyarrow",
                         runtime_env=package_runtime_env())

    _empty_drop = pa.table({id_column: pa.array([], pa.int64()),
                            "token_start": pa.array([], pa.int64())})

    def non_first_sites(group: pa.Table) -> pa.Table:
        ids = group.column(id_column)
        if group.num_rows < 2 or pc.min(ids) == pc.max(ids):
            return _empty_drop
        idv = ids.to_numpy(zero_copy_only=False)
        st = group.column("token_start").to_numpy(zero_copy_only=False)
        order = np.lexsort((st, idv))
        keep_away = order[1:]                     # all but the first site
        return pa.table({
            id_column: pa.array(idv[keep_away], pa.int64()),
            "token_start": pa.array(st[keep_away], pa.int64())})

    drops = occ.groupby("h").map_groups(non_first_sites,
                                        batch_format="pyarrow")

    def collect_starts(group: pa.Table) -> pa.Table:
        st = np.unique(group.column("token_start"
                                    ).to_numpy(zero_copy_only=False))
        # little-endian int64 blob: Acero hash joins reject list<> payload
        # columns, binary rides through (same encoding as the Jaccard
        # join path's shingle blobs)
        return pa.table({
            id_column: group.column(id_column).slice(0, 1),
            "drop_starts": pa.array([st.astype("<i8").tobytes()],
                                    pa.binary())})

    per_doc = drops.groupby(id_column).map_groups(
        collect_starts, batch_format="pyarrow").materialize()

    n_affected = per_doc.count()
    if n_affected <= int(broadcast_max_docs):
        import ray

        dmap: dict = {}
        for b in per_doc.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
            dmap.update(zip(
                b.column(id_column).to_pylist(),
                b.column("drop_starts").to_pylist()))
        dmap_ref = ray.put(dmap)

        def attach(batch: pa.Table) -> pa.Table:
            m = ray.get(dmap_ref)
            ids = batch.column(id_column).cast(pa.int64()
                                               ).to_pylist()
            return batch.append_column(
                "drop_starts",
                pa.array([m.get(i) for i in ids], pa.binary()))

        joined = ds.map_batches(attach, batch_format="pyarrow",
                                runtime_env=package_runtime_env())
    else:
        def cast_id(batch: pa.Table) -> pa.Table:
            # per_doc ids were force-cast int64 by the exploder; align the
            # left side so the Acero join never sees mixed key types
            i = batch.schema.get_field_index(id_column)
            return batch.set_column(i, id_column,
                                    batch.column(id_column).cast(pa.int64()))

        joined = ds.map_batches(cast_id, batch_format="pyarrow").join(
            per_doc, "left_outer", num_partitions=int(join_partitions),
            on=(id_column,))

    def rebuild(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_column: pa.array([], pa.int64()),
                             text_column: pa.array([], pa.string()),
                             "n_kept": pa.array([], pa.int64()),
                             "n_dropped": pa.array([], pa.int64())})
        ids = batch.column(id_column).cast(pa.int64())
        txts = pc.fill_null(batch.column(text_column), "").to_pylist()
        starts_col = batch.column("drop_starts").to_pylist()
        out_t, out_k, out_d = [], [], []
        for t, blob in zip(txts, starts_col):
            toks = t.split(" ")
            if not blob:                  # null (no dups) or empty blob
                out_t.append(t)
                out_k.append(len(toks))
                out_d.append(0)
                continue
            s = np.frombuffer(blob, dtype="<i8")
            # mark [start, start+w) via a diff array (intervals overlap
            # heavily for repeated regions; O(tokens), not O(sites*w))
            d = np.zeros(len(toks) + 1, dtype=np.int64)
            np.add.at(d, np.clip(s, 0, len(toks)), 1)
            np.add.at(d, np.clip(s + w, 0, len(toks)), -1)
            covered = np.cumsum(d[:-1]) > 0
            kept = [tok for tok, c in zip(toks, covered) if not c]
            out_t.append(" ".join(kept))
            out_k.append(len(kept))
            out_d.append(int(covered.sum()))
        return pa.table({id_column: ids,
                         text_column: pa.array(out_t, pa.string()),
                         "n_kept": pa.array(out_k, pa.int64()),
                         "n_dropped": pa.array(out_d, pa.int64())})

    return joined.map_batches(rebuild, batch_format="pyarrow",
                              runtime_env=package_runtime_env())
