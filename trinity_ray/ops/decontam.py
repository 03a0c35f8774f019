"""Benchmark decontamination: flag corpus documents sharing word n-grams
with a (small) benchmark / eval set.

The standard training-data hygiene step (GPT-3 appendix C / Gopher
section A.3 style): extract the benchmark's word n-gram shingles ONCE,
broadcast the set to every worker (``ray.put``, read once per actor —
never re-shipped per batch), and stream the corpus through a stateless
``map_batches`` stage that counts each doc's distinct shingles present in
the benchmark set.  No shuffle, no join: the benchmark side is small by
definition (evals are KBs-MBs; the corpus is the 100-TB side).

Shingling matches the n-gram Jaccard dedup oracle: ``[A-Z0-9]+`` runs of
``upper(text)``, n consecutive tokens joined by single spaces — so the
whole operator is exactly expressible in DuckDB for the correctness gate.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from trinity_ray.rayutil import actor_pool, package_runtime_env
from trinity_ray.tokenizer import WORD_RE as _TOKEN_RE

__all__ = ["benchmark_shingles", "decontaminate", "decontaminate_bloom",
           "ShingleBloom"]


def text_shingles(text: str, n: int) -> set:
    """Distinct word n-gram shingles of one text (upper-cased tokens)."""
    toks = _TOKEN_RE.findall((text or "").upper())
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def benchmark_shingles(texts, n: int = 3) -> frozenset:
    """The broadcastable benchmark shingle set (driver-side: the benchmark
    is the SMALL side — KBs to MBs of eval text)."""
    out: set = set()
    for t in texts:
        out |= text_shingles(t, n)
    return frozenset(out)


class _Decontaminator:
    """Actor-pool stage: benchmark set fetched from the object store once
    per actor in __init__; per batch, count distinct overlapping shingles
    per doc."""

    def __init__(self, bench_ref, n: int, text_column: str):
        import ray

        self.bench = ray.get(bench_ref)   # zero-copy-ish, once per actor
        self.n = n
        self.col = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        counts = np.empty(len(texts), dtype=np.int64)
        bench = self.bench
        n = self.n
        for i, t in enumerate(texts):
            counts[i] = len(text_shingles(t, n) & bench)
        return batch.append_column(
            "n_contaminated", pa.array(counts, pa.int64()))


def decontaminate(ds, benchmark_texts, n: int = 3, min_overlap: int = 1,
                  text_column: str = "text", mode: str = "flag",
                  concurrency: int = 8):
    """Flag (or drop) documents overlapping the benchmark set.

    ``mode="flag"`` appends ``n_contaminated`` (distinct shingles shared
    with the benchmark) and ``contaminated``; ``mode="drop"`` removes
    contaminated rows — the production path, same single streaming pass.
    """
    import ray

    bench = benchmark_shingles(benchmark_texts, n)
    bench_ref = ray.put(bench)
    out = ds.map_batches(
        _Decontaminator, fn_constructor_args=(bench_ref, n, text_column),
        batch_format="pyarrow", concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env())
    return _finish(out, mode, min_overlap)


def _finish(out, mode: str, min_overlap: int):
    """Shared flag/drop tail of the exact and Bloom decontaminators —
    ONE definition so the two paths cannot silently diverge."""
    if mode == "drop":
        return out.filter(expr=f"n_contaminated < {int(min_overlap)}") \
                  .drop_columns(["n_contaminated"])
    if mode != "flag":
        raise ValueError(f"unknown mode {mode!r}")

    def add_flag(batch: pa.Table) -> pa.Table:
        c = batch.column("n_contaminated").to_numpy()
        return batch.append_column(
            "contaminated", pa.array(c >= min_overlap))

    return out.map_batches(add_flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-filter scale path
# ---------------------------------------------------------------------------

class ShingleBloom:
    """Vectorized numpy Bloom filter over 64-bit shingle hashes.

    The exact path broadcasts the benchmark shingle set as a Python
    ``frozenset`` — pickled per actor, ~60-100 B per shingle of heap.
    At ~10 bits per element (fp 1%) this bit array is an order of
    magnitude smaller, and because it is a flat numpy uint64 buffer it
    rides the object store ZERO-COPY: every actor on a node maps the
    same plasma pages instead of materializing its own set.  Membership
    has no false negatives, so a Bloom pre-filter can never miss a
    contaminated doc; false positives (rate ``fp_rate``) only ever
    over-flag, and the tiny flagged subset can be re-checked exactly.

    Each of the k probes is an INDEPENDENT splitmix64 finalization of
    (hash + i*golden) — classic double hashing (h1 + i*h2 mod m) was
    measured 30x over its theoretical fp at small m, because the probe
    sequence is an arithmetic progression mod m and the probes are
    strongly correlated; a full avalanche per probe restores the ideal
    rate at one vectorized mix pass per probe.  m also floors at 2^12
    bits (512 B) — below that the theory constants don't hold anyway.
    """

    __slots__ = ("bits", "k", "mask")

    def __init__(self, n_items: int, fp_rate: float = 0.01):
        if not 0 < fp_rate < 1:
            raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
        n = max(1, int(n_items))
        m_ideal = -n * np.log(fp_rate) / (np.log(2) ** 2)
        log2m = max(12, int(np.ceil(np.log2(m_ideal))))
        m = 1 << log2m
        self.mask = np.uint64(m - 1)
        self.k = int(np.clip(round(m / n * np.log(2)), 1, 16))
        self.bits = np.zeros(m >> 6, dtype=np.uint64)

    def _probes(self, hashes: np.ndarray, i: int) -> np.ndarray:
        from trinity_ray.ops.sketch import _GOLDEN, _mix64

        # scalar multiple pre-wrapped in Python ints: numpy warns on
        # uint64 scalar overflow even though wraparound is the intent
        step = np.uint64(((i + 1) * int(_GOLDEN)) & 0xFFFFFFFFFFFFFFFF)
        return _mix64(hashes + step) & self.mask

    def add_many(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, np.uint64)
        one = np.uint64(1)
        for i in range(self.k):
            idx = self._probes(h, i)
            np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                             one << (idx & np.uint64(63)))

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, np.uint64)
        hit = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            idx = self._probes(h, i)
            word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
            hit &= ((word >> (idx & np.uint64(63))) & np.uint64(1)
                    ).astype(bool)
        return hit

    @property
    def nbytes(self) -> int:
        return int(self.bits.nbytes)


def _shingle_window_hashes(texts: list, n: int):
    """All n-gram window hashes of a batch, vectorized: one Arrow hash
    pass over the flattened tokens, then the SHARED window-polynomial
    kernel (ops.sketch.window_poly_hashes — same index arithmetic as the
    span-dedup exploder, defined once).  Returns (doc_idx, window_hash)
    arrays; hashes collide with probability ~2^-64 (the Bloom adds its
    own documented fp on top)."""
    from trinity_ray.ops.sketch import _hash64, window_poly_hashes

    toks_per_doc = [_TOKEN_RE.findall((t or "").upper()) for t in texts]
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    flat = [w for toks in toks_per_doc for w in toks]
    th = (_hash64(pa.array(flat, pa.string())) if flat
          else np.empty(0, np.uint64))
    doc_idx, _, acc = window_poly_hashes(th, lens, n)
    return doc_idx, acc


class _BloomDecontaminator:
    """Actor-pool stage: the Bloom bit array is fetched from the object
    store once per actor (zero-copy numpy view over plasma); per batch,
    distinct window-hash hits are counted per doc with a lexsort +
    bincount — no Python per shingle."""

    def __init__(self, bloom_ref, n: int, text_column: str):
        import ray

        bits, k, mask = ray.get(bloom_ref)
        self.bloom = ShingleBloom.__new__(ShingleBloom)
        self.bloom.bits, self.bloom.k, self.bloom.mask = bits, k, mask
        self.n = n
        self.col = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        doc_idx, wh = _shingle_window_hashes(texts, self.n)
        counts = np.zeros(len(texts), dtype=np.int64)
        if len(wh):
            order = np.lexsort((wh, doc_idx))
            d, h = doc_idx[order], wh[order]
            first = np.ones(len(h), dtype=bool)
            first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
            hits = self.bloom.contains_many(h[first])
            np.add.at(counts, d[first][hits], 1)
        return batch.append_column(
            "n_contaminated", pa.array(counts, pa.int64()))


def decontaminate_bloom(ds, benchmark_texts, n: int = 3,
                        min_overlap: int = 1, fp_rate: float = 0.01,
                        text_column: str = "text", mode: str = "flag",
                        concurrency: int = 8):
    """Bloom-filter decontamination — :func:`decontaminate` semantics with
    a ~10-bits-per-shingle broadcast instead of a Python set (the 100-TB
    path when the benchmark union is GBs: many evals, or a whole held-out
    split).  ZERO false negatives by construction — every doc the exact
    operator flags is flagged here; false positives over-flag at most
    ``fp_rate`` per distinct shingle probe (tests pin both properties).
    Flagged docs are a superset; re-check them with the exact operator if
    exact counts matter (the flagged side is tiny by definition)."""
    import ray

    # one vectorized pass over the whole benchmark list (the per-batch
    # shape _BloomDecontaminator uses), not a hash pass per text
    _, wh = _shingle_window_hashes(list(benchmark_texts), n)
    arr = np.unique(wh)
    bloom = ShingleBloom(len(arr), fp_rate)
    if len(arr):
        bloom.add_many(arr)
    bloom_ref = ray.put((bloom.bits, bloom.k, bloom.mask))
    out = ds.map_batches(
        _BloomDecontaminator, fn_constructor_args=(bloom_ref, n, text_column),
        batch_format="pyarrow", concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env())
    return _finish(out, mode, min_overlap)
