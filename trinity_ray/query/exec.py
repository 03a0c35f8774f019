"""Per-segment query execution: numpy set algebra over decoded postings.

This is the batch re-expression of the reference's docset-iterator algebra
(/root/reference/docset_iterators.h — Conjuction/Disjunction/Filter/Phrase
iterators with next()/advance()) and windowed drive loop (docset_spans.cpp):
instead of pulling one docID at a time through virtual iterators, we decode
each query term's postings into sorted numpy arrays once and apply
vectorized sorted-set kernels:

    AND        -> rarest-first sorted intersection   (ConjuctionAllPLI,
                  docset_iterators.h:305-370; cost-ordered per exec.cpp:27-131)
    OR         -> k-way union (concat + unique)      (DisjunctionAllPLI)
    NOT        -> sorted anti-join                   (Filter, docset_iterators.h:147-172)
    >=k of n   -> multiset count threshold           (DisjunctionSome,
                  docset_iterators.h:61-140 / DocsSetSpanForDisjunctionsWithThreshold)
    phrase     -> positional adjacency join          (Phrase + DocWordsSpace,
                  docset_iterators.h:374-413, docwordspace.h:8-139)

Scoring is the reference BM25 with the length norm stubbed to k1
(similarity.h:165-255):  score(d) = sum_t idf_t * tf/(tf + k1),
idf_t = ln(1 + (N - df + 0.5)/(df + 0.5)), k1 = 1.2, df/N GLOBAL across
segments (summed in reset(), similarity.h:238-250) — never partial-idf,
so cross-partition results are rank-identical to a single-node run.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow.dataset as pads

from trinity_ray.codec import PostingsBlob
from trinity_ray.index.segment import POSTINGS_FILE
from trinity_ray.query.ast import (
    And,
    ConstFalse,
    MatchAll,
    MatchSome,
    Node,
    Not,
    Optional_,
    Or,
    Phrase,
    Token,
)

K1 = 1.2  # similarity.h:169-172 (b = 0.75 unused: norm stubbed to k1)
_POS_SHIFT = 15  # > log2(MAX_POSITION)+1 headroom for pos+phrase-offset keys

EMPTY_U64 = np.empty(0, dtype=np.uint64)


def bm25_idf(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    """idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — similarity.h:179-181."""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


@dataclass
class TermPostings:
    doc_ids: np.ndarray   # sorted uint64
    freqs: np.ndarray     # uint64
    blob: PostingsBlob | None = None
    _pos: tuple[np.ndarray, np.ndarray] | None = None

    def positions(self) -> tuple[np.ndarray, np.ndarray]:
        if self._pos is None:
            if self.blob is None or not self.blob.has_positions:
                raise ValueError("no positions available")
            self._pos = self.blob.decode_positions(self.freqs)
        return self._pos


class SegmentReader:
    """Loaded-once per-segment state: the analogue of SegmentIndexSource's
    mmap'd terms dict + postings (segment_index_source.cpp:5-186), with the
    postings.parquet row-group statistics playing the terms-skiplist role
    (terms.cpp:8-103): a term probe only reads the row groups whose
    [min_term, max_term] range covers it.
    """

    def __init__(self, seg_path: str, doc_base: int, doc_count: int,
                 mask: np.ndarray | None = None):
        self.seg_path = seg_path
        self.doc_base = doc_base
        self.doc_count = doc_count
        self.mask = mask if mask is not None and len(mask) else None  # sorted deleted doc_ids
        single = os.path.join(seg_path, POSTINGS_FILE)
        sharded = os.path.join(seg_path, "postings")  # merged: term-sharded files
        if os.path.exists(single):
            self._dataset = pads.dataset(single, format="parquet")
        elif os.path.isdir(sharded):
            self._dataset = pads.dataset(sharded, format="parquet")
        else:
            self._dataset = None  # deletes-only segment
        self._universe: np.ndarray | None = None
        self._cache: dict[str, TermPostings | None] = {}

    # -- dictionary probe ----------------------------------------------------
    def lookup_terms(self, terms: list[str]) -> dict[str, int]:
        """df per term (0 if absent) — resolve_term_ctx analogue."""
        missing = [t for t in terms if t not in self._cache]
        if missing and self._dataset is None:
            for t in missing:
                self._cache[t] = None
            missing = []
        if missing:
            tbl = self._dataset.to_table(
                columns=["term", "df", "blob"],
                filter=pads.field("term").isin(missing),
            )
            found = {}
            for term, blob in zip(tbl.column("term").to_pylist(),
                                  tbl.column("blob").to_pylist()):
                found[term] = blob
            for t in missing:
                if t in found:
                    pb = PostingsBlob(found[t])
                    d, f = pb.decode_docs_freqs()
                    self._cache[t] = TermPostings(d, f, pb)
                else:
                    self._cache[t] = None
        return {t: (0 if self._cache[t] is None else int(self._cache[t].doc_ids.size))
                for t in terms}

    def postings(self, term: str) -> TermPostings | None:
        if term not in self._cache:
            self.lookup_terms([term])
        return self._cache[term]

    def universe(self) -> np.ndarray:
        """All live docIDs.  Built segments are dense ranges; merged segments
        may have holes where deletes were applied, so prefer docs.parquet."""
        if self._universe is None:
            docs_path = os.path.join(self.seg_path, "docs.parquet")
            if os.path.exists(docs_path):
                import pyarrow.parquet as pq

                ids = pq.read_table(docs_path, columns=["doc_id"]).column("doc_id")
                self._universe = np.sort(ids.to_numpy().astype(np.uint64))
            else:
                self._universe = np.arange(
                    self.doc_base, self.doc_base + self.doc_count, dtype=np.uint64
                )
        return self._universe

    # -- boolean evaluation --------------------------------------------------
    def match(self, node: Node) -> np.ndarray:
        """Sorted unique doc_ids matching ``node`` (before delete-masking)."""
        if isinstance(node, ConstFalse):
            return EMPTY_U64
        if isinstance(node, MatchAll):
            return self.universe()
        if isinstance(node, Token):
            tp = self.postings(node.term)
            return tp.doc_ids if tp is not None else EMPTY_U64
        if isinstance(node, Phrase):
            return self._match_phrase(node.terms)
        if isinstance(node, Not):
            return _setdiff(self.universe(), self.match(node.child))
        if isinstance(node, Optional_):
            return self.universe()
        if isinstance(node, And):
            positives = [c for c in node.children
                         if not isinstance(c, (Not, Optional_))]
            negatives = [c.child for c in node.children if isinstance(c, Not)]
            if positives:
                # cost-ordered: intersect in ascending-cardinality order
                # (reorder_execnodes, exec.cpp:27-131)
                sets = sorted((self.match(c) for c in positives), key=len)
                cur = sets[0]
                for s in sets[1:]:
                    if cur.size == 0:
                        break
                    cur = _intersect(cur, s)
            else:
                cur = self.universe()
            for c in negatives:
                if cur.size == 0:
                    break
                cur = _setdiff(cur, self.match(c))  # FilteredDocsSetSpan analogue
            return cur
        if isinstance(node, Or):
            parts = [self.match(c) for c in node.children]
            parts = [p for p in parts if p.size]
            if not parts:
                return EMPTY_U64
            if len(parts) == 1:
                return parts[0]
            return np.unique(np.concatenate(parts))
        if isinstance(node, MatchSome):
            parts = [self.match(c) for c in node.children]
            allv = np.concatenate([p for p in parts if p.size] or [EMPTY_U64])
            if allv.size == 0:
                return EMPTY_U64
            vals, counts = np.unique(allv, return_counts=True)
            return vals[counts >= node.min_match]
        raise TypeError(f"unknown node {node!r}")

    def _match_phrase(self, terms: tuple[str, ...]) -> np.ndarray:
        tps = []
        for t in terms:
            tp = self.postings(t)
            if tp is None:
                return EMPTY_U64
            tps.append(tp)
        # candidates: intersection, rarest-first
        order = np.argsort([tp.doc_ids.size for tp in tps], kind="stable")
        cand = tps[order[0]].doc_ids
        for i in order[1:]:
            if cand.size == 0:
                return EMPTY_U64
            cand = _intersect(cand, tps[i].doc_ids)
        if cand.size == 0:
            return EMPTY_U64
        # positional verification: occurrence keys rank*2^15 + pos; the chain
        # survives if pos+i exists for term i (DocWordsSpace check,
        # docwordspace.h:66-139)
        survivors = None
        for i, tp in enumerate(tps):
            pos, offs = tp.positions()
            idx = np.searchsorted(tp.doc_ids, cand)
            starts = offs[idx]
            lens = offs[idx + 1] - starts
            flat = _range_gather(starts, lens)
            keys = (np.repeat(np.arange(cand.size, dtype=np.uint64), lens)
                    << np.uint64(_POS_SHIFT)) + pos[flat]
            if i == 0:
                survivors = keys
            else:
                shifted = survivors + np.uint64(i)
                sel = _member(shifted, keys)
                survivors = survivors[sel]
            if survivors.size == 0:
                return EMPTY_U64
        ranks = np.unique(survivors >> np.uint64(_POS_SHIFT))
        return cand[ranks.astype(np.int64)]

    # -- scoring -------------------------------------------------------------
    def score(self, matched: np.ndarray, idf: dict[str, float]) -> np.ndarray:
        """BM25 with norm stubbed to k1 (similarity.h:228-235)."""
        scores = np.zeros(matched.size, dtype=np.float64)
        for term, w in idf.items():
            tp = self.postings(term)
            if tp is None or w == 0.0:
                continue
            idx = np.searchsorted(tp.doc_ids, matched)
            idx_c = np.minimum(idx, tp.doc_ids.size - 1)
            valid = tp.doc_ids[idx_c] == matched
            tf = tp.freqs[idx_c[valid]].astype(np.float64)
            scores[valid] += w * tf / (tf + K1)
        return scores

    def execute(self, node: Node, idf: dict[str, float], k: int,
                ) -> tuple[np.ndarray, np.ndarray]:
        """Match + mask + score + local top-k; returns (doc_ids, scores)."""
        matched = self.match(node)
        if self.mask is not None and matched.size:
            matched = _setdiff(matched, self.mask)
        if matched.size == 0:
            return EMPTY_U64, np.empty(0, dtype=np.float64)
        scores = self.score(matched, idf)
        if k and matched.size > k:
            # O(n) partial selection, then widen to include every doc tied
            # with the k-th score so the (score desc, doc_id asc) tie-break
            # stays exact across the cutoff
            part = np.argpartition(-scores, k - 1)
            kth = scores[part[k - 1]]
            tied = part[k:][scores[part[k:]] == kth]
            sel = np.concatenate((part[:k], tied))
            matched, scores = matched[sel], scores[sel]
        order = np.lexsort((matched, -scores))  # (score desc, doc_id asc)
        if k:
            order = order[:k]
        return matched[order], scores[order]


# ---------------------------------------------------------------------------
# sorted-array kernels
# ---------------------------------------------------------------------------

def _intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sorted-unique intersection; gallops from the smaller side."""
    if a.size > b.size:
        a, b = b, a
    sel = _member(a, b)
    return a[sel]


def _member(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Boolean mask: a[i] in b (both sorted)."""
    if b.size == 0:
        return np.zeros(a.size, dtype=bool)
    idx = np.searchsorted(b, a)
    idx_c = np.minimum(idx, b.size - 1)
    return b[idx_c] == a


def _setdiff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.size == 0 or b.size == 0:
        return a
    return a[~_member(a, b)]


def _range_gather(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Indices covering [starts[i], starts[i]+lens[i]) concatenated."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    cum0 = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.arange(total, dtype=np.int64) + np.repeat(starts - cum0, lens)
