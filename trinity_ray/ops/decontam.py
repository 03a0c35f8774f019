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

__all__ = ["benchmark_shingles", "decontaminate"]


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
