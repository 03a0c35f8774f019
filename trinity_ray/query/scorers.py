"""Pluggable scoring, mirroring the reference's Similarity seam
(/root/reference/similarity.h:14-53: TrivialScorer / TFIDFScorer /
BM25Scorer are swappable IndexSourcesCollection scorers).

A scorer is three vectorized functions:

* ``weight(df, n_docs)``  — per-term query-time weight, computed from the
  GLOBAL df/N (summed across all segments first — similarity.h:238-250).
* ``contrib(w, tf)``      — per-doc score contribution (numpy-vectorized
  over a tf array).
* ``bound(w, max_tf)``    — an upper bound of ``contrib`` given the
  block-max tf, used for WAND / max-score pruning.  Every reference
  scorer's contribution is monotone in tf, so ``bound == contrib(max_tf)``.

Formulas (reference file:line):

* trivial — score = freq (similarity.h:56-72)
* tfidf   — idf = ln((N+1)/(df+1)) + 1, tf' = sqrt(freq)
            (similarity.h:86-132)
* bm25    — idf = ln(1 + (N - df + 0.5)/(df + 0.5)), k1 = 1.2, and the
            length norm stubbed to k1: score = idf * tf/(tf + k1)
            (similarity.h:165-255; NOT textbook BM25 — the reference's
            norm cache is disabled, similarity.h:228-235)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

K1 = 1.2  # similarity.h:169-172 (b = 0.75 unused: norm stubbed to k1)


@dataclass(frozen=True)
class Scorer:
    name: str
    weight: Callable[[float, float], float]          # (df, n_docs) -> w
    contrib: Callable[[float, np.ndarray], np.ndarray]  # (w, tf) -> score
    bound: Callable[[float, float], float]           # (w, max_tf) -> ub


def _bm25_weight(df: float, n_docs: float) -> float:
    if df <= 0:
        return 0.0
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def _tfidf_weight(df: float, n_docs: float) -> float:
    if df <= 0:
        return 0.0
    return float(np.log((n_docs + 1.0) / (df + 1.0)) + 1.0)


SCORERS: dict[str, Scorer] = {
    "bm25": Scorer(
        "bm25",
        weight=_bm25_weight,
        contrib=lambda w, tf: w * tf / (tf + K1),
        bound=lambda w, mtf: w * mtf / (mtf + K1),
    ),
    "tfidf": Scorer(
        "tfidf",
        weight=_tfidf_weight,
        contrib=lambda w, tf: w * np.sqrt(tf),
        bound=lambda w, mtf: w * float(np.sqrt(mtf)),
    ),
    "trivial": Scorer(
        "trivial",
        weight=lambda df, n_docs: 1.0 if df > 0 else 0.0,
        contrib=lambda w, tf: tf * 1.0,
        bound=lambda w, mtf: float(mtf),
    ),
}


def get_scorer(name: str) -> Scorer:
    try:
        return SCORERS[name]
    except KeyError:
        raise ValueError(f"unknown scorer {name!r}; have {sorted(SCORERS)}") from None
