"""Index search: scatter per-segment execution, gather global top-k.

The reference's collection query path (exec_query over an
IndexSourcesCollection, /root/reference/exec.h:63-177) runs one isolated
execution per index source — "they are isolated so parallel processing them
requires no coordination" (exec.h:57-62) — and the app merges per-source
top-k.  Ours is the same scatter-gather:

    driver: parse -> normalize -> resolve global df (dictionary probes)
          -> broadcast (plan, idf) to per-segment executors
    segment: match (numpy set algebra) -> mask deletes -> BM25 -> local top-k
    driver: k-way merge on (score desc, doc_id asc)

Two execution backends:
- ``LocalSearcher``: driver-side loop over SegmentReaders (tests, small runs)
- ``RaySearcher``: an actor pool (``SegmentSearchActor``) where each actor
  owns a shard of segments with warm postings caches — the "stateful stage
  loaded once per worker" pattern; queries fan out to every actor, partial
  top-k's stream back.  Plans and idf maps are tiny and ship per query;
  postings never leave their actor.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq

from trinity_ray.index.segment import (
    DELETES_FILE,
    IndexManifest,
    SegmentMeta,
    read_manifest,
    segment_dir,
)
from trinity_ray.query.ast import (
    And,
    Fuzzy,
    MatchSome,
    Node,
    Not,
    Optional_,
    Or,
    Prefix,
    Token,
    assign_query_indices,
    collect_scorable_terms,
    collect_scorable_weights,
    collect_terms,
    parse_query,
)
from trinity_ray.query.exec import EMPTY_U64, SegmentReader, bm25_idf
from trinity_ray.query.scorers import get_scorer


def expand_fuzzy(node: Node, edit1, max_expand: int = 16,
                 prefix_df=None) -> Node:
    """Rewrite dictionary-dependent leaves into concrete weighted ORs:

    - :class:`Fuzzy` → the exact term at the leaf's weight plus its
      edit-distance-1 neighborhood at HALF it (the rewrite-provenance
      convention — originals outrank expansions at equal tf), capped at
      the ``max_expand`` highest-df neighbors (the budget seam, like
      rewrite_query's alternative budget).
    - :class:`Prefix` → the OR of its completions, ALL at the leaf's
      weight (a completion IS the intended term), same df-ordered cap.

    ``edit1`` / ``prefix_df`` map a term to its GLOBAL term->df
    expansion set (df merged across all segments/shards BEFORE
    selection, so every shard executes the same expansion).  A leaf with
    no expansions degrades to the exact Token."""
    def walk(n: Node) -> Node:
        if isinstance(n, Fuzzy):
            near = {t: d for t, d in edit1(n.term).items()
                    if t != n.term}
            alts = sorted(near.items(), key=lambda kv: (-kv[1], kv[0]))
            alts = alts[:max_expand]
            exact = Token(n.term, n.weight)
            if not alts:
                return exact
            return Or((exact,) + tuple(
                Token(t, 0.5 * n.weight) for t, _ in alts))
        if isinstance(n, Prefix):
            comp = dict(prefix_df(n.term)) if prefix_df is not None else {}
            alts = sorted(comp.items(), key=lambda kv: (-kv[1], kv[0]))
            alts = alts[:max_expand]
            if not alts:
                return Token(n.term, n.weight)
            if len(alts) == 1:
                return Token(alts[0][0], n.weight)
            return Or(tuple(Token(t, n.weight) for t, _ in alts))
        if isinstance(n, Not):
            return Not(walk(n.child))
        if isinstance(n, Optional_):
            return Optional_(walk(n.child))
        if isinstance(n, MatchSome):
            return MatchSome(n.min_match, tuple(
                walk(c) for c in n.children))
        if isinstance(n, (And, Or)):
            return type(n)(tuple(walk(c) for c in n.children))
        return n

    return walk(node)


@dataclass
class SearchResult:
    doc_ids: np.ndarray
    scores: np.ndarray

    def to_rows(self) -> list[dict]:
        return [
            {"rank": i + 1, "doc_id": int(d), "score": float(s)}
            for i, (d, s) in enumerate(zip(self.doc_ids, self.scores))
        ]


def _segment_masks(manifest: IndexManifest, index_dir: str) -> dict[str, np.ndarray]:
    """Per-segment deleted-doc masks from NEWER generations' delete lists
    (masked_documents_registry semantics, docidupdates.h:90-191: a source is
    masked only by sources with a greater generation)."""
    deleters = [s for s in manifest.segments if s.has_deletes]
    if not deleters:
        return {}
    by_gen: list[tuple[int, np.ndarray]] = []
    for s in deleters:
        path = os.path.join(segment_dir(index_dir, s.name), DELETES_FILE)
        ids = pq.read_table(path, columns=["doc_id"]).column("doc_id").to_numpy()
        by_gen.append((s.generation, np.sort(ids.astype(np.uint64))))
    masks: dict[str, np.ndarray] = {}
    for s in manifest.segments:
        newer = [ids for gen, ids in by_gen if gen > s.generation]
        if not newer:
            continue
        allm = np.unique(np.concatenate(newer))
        lo = np.searchsorted(allm, s.doc_base)
        hi = np.searchsorted(allm, s.doc_end)
        if hi > lo:
            masks[s.name] = allm[lo:hi]
    return masks


def _combine_allowed(reader, filter_ids: np.ndarray | None, doc_predicate
                     ) -> np.ndarray | None:
    """Per-segment allowed-doc set from an explicit app id array and/or a
    metadata predicate; None means unconstrained."""
    allowed = None
    if filter_ids is not None:
        ids = np.asarray(filter_ids, dtype=np.uint64)
        lo = np.searchsorted(ids, reader.doc_base)
        hi = np.searchsorted(ids, reader.doc_base + reader.doc_count)
        allowed = ids[lo:hi]
    if doc_predicate is not None:
        pred_ids = reader.doc_ids_where(doc_predicate)
        allowed = pred_ids if allowed is None else \
            allowed[np.isin(allowed, pred_ids)]
    return allowed


def _collect_rich_parts(readers, sorted_docs: np.ndarray, terms: list[str]
                        ) -> list[tuple[str, np.ndarray, np.ndarray,
                                        np.ndarray, np.ndarray]]:
    """Per-term hit detail for winner docs across a list of SegmentReaders:
    [(term, doc_ids, tf, pos_flat, lens, pay_flat_or_None)].  Each reader
    contributes only the docs in its live (unmasked) range, so a replaced
    docID's hits come from the replacing generation, never the stale
    segment."""
    parts = []
    for r in readers:
        lo = np.searchsorted(sorted_docs, r.doc_base)
        hi = np.searchsorted(sorted_docs, r.doc_base + r.doc_count)
        sub = sorted_docs[lo:hi]
        if r.mask is not None and sub.size:
            sub = sub[~np.isin(sub, r.mask)]
        if sub.size == 0:
            continue
        for t, fidx, tf, pos_flat, lens, pay_flat in r.rich_hits(sub, terms):
            parts.append((t, sub[fidx], tf, pos_flat, lens, pay_flat))
    return parts


def rich_hits_table(res: SearchResult,
                    parts: list[tuple[str, np.ndarray, np.ndarray,
                                      np.ndarray, np.ndarray]]):
    """Assemble the rich-match output table — one row per (doc, term) with
    tf and the term's positions (exec.h:11-43 ConsiderResponse default mode
    re-expressed as an Arrow table): columns rank, doc_id, score, term, tf,
    positions (list<int64>).  Rows ordered by (rank, term)."""
    import pyarrow as pa

    if not parts:
        cols = {
            "rank": pa.array([], pa.int32()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "positions": pa.array([], pa.list_(pa.int64())),
        }
        return pa.table(cols)
    # payloads column only when EVERY part carries them (mixed-payload
    # segment sets drop the channel, matching merge semantics)
    any_pay = all(p[5] is not None for p in parts)
    # vectorized assembly: concatenate part arrays, map rank/score via a
    # sorted lookup, order rows by (rank, term) with one lexsort, reorder
    # the positions list column with Arrow take (no per-row Python)
    doc_all = np.concatenate([p[1] for p in parts]).astype(np.int64)
    tf_all = np.concatenate([p[2] for p in parts]).astype(np.int64)
    lens_all = np.concatenate([p[4] for p in parts]).astype(np.int64)
    pos_all = np.concatenate([p[3] for p in parts]).astype(np.int64)
    term_all = np.concatenate(
        [np.full(p[1].size, p[0], dtype=object) for p in parts])
    res_ids = res.doc_ids.astype(np.int64)
    id_order = np.argsort(res_ids, kind="stable")
    pos_in_res = id_order[np.searchsorted(res_ids[id_order], doc_all)]
    ranks = (pos_in_res + 1).astype(np.int32)
    scores = res.scores[pos_in_res]
    tcodes = np.unique(term_all, return_inverse=True)[1]
    order = np.lexsort((tcodes, ranks))
    offsets = np.concatenate(([0], np.cumsum(lens_all))).astype(np.int32)
    pos_list = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(pos_all, pa.int64()))
    take = pa.array(order.astype(np.int64))
    cols = {
        "rank": pa.array(ranks[order], pa.int32()),
        "doc_id": pa.array(doc_all[order], pa.int64()),
        "score": pa.array(scores[order], pa.float64()),
        "term": pa.array(list(term_all[order]), pa.string()),
        "tf": pa.array(tf_all[order], pa.int64()),
        "positions": pos_list.take(take),
    }
    if any_pay:
        # payloads are one-per-hit: offsets come from tf, NOT the position
        # lens (a positionless index stores payloads with zero positions)
        pay_all = np.concatenate([p[5] for p in parts]).astype(np.int64)
        pay_offsets = np.concatenate(
            ([0], np.cumsum(tf_all))).astype(np.int32)
        pay_list = pa.ListArray.from_arrays(
            pa.array(pay_offsets, pa.int32()), pa.array(pay_all, pa.int64()))
        cols["payloads"] = pay_list.take(take)
    return pa.table(cols)


def merge_topk(parts: list[tuple[np.ndarray, np.ndarray]], k: int
               ) -> SearchResult:
    """Global merge with tie-break (score desc, doc_id asc)."""
    if not parts:
        return SearchResult(EMPTY_U64, np.empty(0, dtype=np.float64))
    docs = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    order = np.lexsort((docs, -scores))
    if k:
        order = order[:k]
    return SearchResult(docs[order], scores[order])


class LocalSearcher:
    """Driver-side searcher over all segments (no Ray)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest = read_manifest(index_dir)
        self.n_docs = float(self.manifest.total_stats().docs_cnt)
        masks = _segment_masks(self.manifest, index_dir)
        self.readers = [
            SegmentReader(segment_dir(index_dir, s.name), s.doc_base, s.doc_count,
                          mask=masks.get(s.name))
            for s in self.manifest.segments
        ]
        self._fuzzy_cache: dict[str, dict[str, int]] = {}
        self._prefix_cache: dict[str, dict[str, int]] = {}

    def _edit1_merged(self, term: str) -> dict[str, int]:
        """Edit-distance-1 neighborhood with GLOBAL df (summed across all
        segments before any selection), memoized per searcher."""
        hit = self._fuzzy_cache.get(term)
        if hit is None:
            hit = {}
            for r in self.readers:
                for t, df in r.edit1_terms(term).items():
                    hit[t] = hit.get(t, 0) + df
            self._fuzzy_cache[term] = hit
        return hit

    def _prefix_merged(self, prefix: str) -> dict[str, int]:
        """Prefix completions with GLOBAL df (same global-before-selection
        rule as _edit1_merged), memoized per searcher."""
        hit = self._prefix_cache.get(prefix)
        if hit is None:
            hit = {}
            for r in self.readers:
                for t, df in r.prefix_terms(prefix).items():
                    hit[t] = hit.get(t, 0) + df
            self._prefix_cache[prefix] = hit
        return hit

    def _parse(self, query: str | Node) -> Node:
        node = parse_query(query, self.manifest.tokenizer) \
            if isinstance(query, str) else query
        return expand_fuzzy(node, self._edit1_merged,
                            prefix_df=self._prefix_merged)

    def resolve_idf(self, node: Node, scorer: str = "bm25") -> dict[str, float]:
        """Global df across segments -> per-term weight (similarity.h:238-250:
        stats and df summed over ALL sources before any scoring — never
        partial-idf).  Weight formula comes from the pluggable scorer."""
        terms = collect_terms(node)
        if not terms:
            return {}
        sc = get_scorer(scorer)
        df = {t: 0 for t in terms}
        for r in self.readers:
            for t, d in r.lookup_terms(terms).items():
                df[t] += d
        wmul = collect_scorable_weights(node)
        return {t: sc.weight(float(df[t]), self.n_docs) * w
                for t, w in wmul.items() if df[t] > 0}

    def search(self, query: str | Node, k: int = 10,
               scorer: str = "bm25", filter_ids: np.ndarray | None = None,
               doc_predicate=None) -> SearchResult:
        """``filter_ids`` (sorted global doc_ids — the VectorIDs app-docset
        seam) and/or ``doc_predicate`` (callable over each segment's docs
        metadata table — the IndexDocumentsFilter seam) restrict MATCHING;
        collection stats are untouched, exactly like delete masks."""
        node = self._parse(query)
        idf = self.resolve_idf(node, scorer)
        parts = []
        for r in self.readers:
            allowed = _combine_allowed(r, filter_ids, doc_predicate)
            if allowed is not None and allowed.size == 0:
                continue
            parts.append(r.execute(node, idf, k, scorer, allowed=allowed))
        return merge_topk([p for p in parts if p[0].size], k)

    def suggest_terms(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Top-k dictionary terms with ``prefix`` by global df (term
        autocomplete over the sorted dictionaries; ties broken
        lexicographically).  The prefix is normalized through the index
        tokenizer when it maps to a single token (so 're' finds 'RETURN'
        like every other query entry point).  Zero postings IO."""
        from trinity_ray.tokenizer import get_tokenizer

        toks = get_tokenizer(self.manifest.tokenizer)(prefix)
        if len(toks) == 1:
            prefix = toks[0]
        acc: dict[str, int] = {}
        for r in self.readers:
            for t, df in r.prefix_terms(prefix).items():
                acc[t] = acc.get(t, 0) + df
        return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def fuzzy_terms(self, term: str, k: int = 10) -> list[tuple[str, int]]:
        """Top-k dictionary terms within Levenshtein distance 1 of ``term``
        by global df (typo-tolerant term lookup / did-you-mean).  The probe
        is normalized through the index tokenizer when it maps to a single
        token, like suggest_terms.  Per-segment SymSpell deletion-index
        probes (SegmentReader.edit1_terms) — zero postings IO."""
        from trinity_ray.tokenizer import get_tokenizer

        toks = get_tokenizer(self.manifest.tokenizer)(term)
        if len(toks) == 1:
            term = toks[0]
        acc: dict[str, int] = {}
        for r in self.readers:
            for t, df in r.edit1_terms(term).items():
                acc[t] = acc.get(t, 0) + df
        return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def facet_counts(self, query: str | Node, column: str
                     ) -> list[tuple[object, int]]:
        """Per-value document counts of docs-metadata ``column`` over the
        query's match set — the aggregation a matched_document consumer
        runs app-side in the reference (exec.h:11-43 rich-match consumer,
        here fused segment-side so only (value, count) partials cross
        segments, never matched ids or metadata).  Delete masks apply;
        collection stats are untouched (no scoring happens at all).
        Returns (value, count) sorted by count desc, value asc."""
        import pyarrow.compute as pc

        from trinity_ray.query.exec import _setdiff

        node = self._parse(query)
        acc: dict[object, int] = {}
        for r in self.readers:
            m = r.match(node)
            if r.mask is not None and m.size:
                m = _setdiff(m, r.mask)
            if m.size == 0:
                continue
            vc = pc.value_counts(r.doc_values(m, column))
            for rec in vc:
                v = rec["values"].as_py()
                acc[v] = acc.get(v, 0) + rec["counts"].as_py()
        return sorted(acc.items(), key=lambda kv: (-kv[1], str(kv[0])))

    def search_subtrees(self, query: str | Node, k: int = 10,
                        scorer: str = "bm25") -> SearchResult:
        """Accumulated-score OR-of-subtrees
        (DocsSetSpanForDisjunctionsWithSpansAndCost, docset_spans.cpp:304):
        each top-level OR branch contributes its own terms' scores only on
        docs matching that branch."""
        node = self._parse(query)
        idf = self.resolve_idf(node, scorer)
        parts = [r.execute_subtrees(node, idf, k, scorer)
                 for r in self.readers]
        return merge_topk([p for p in parts if p[0].size], k)

    def search_rich(self, query: str | Node, k: int = 10,
                    scorer: str = "bm25"):
        """Rich-match mode (the reference's default execution mode,
        exec.h:11-43): top-k plus per-(doc, term) tf and positions.
        Returns (SearchResult, pyarrow.Table)."""
        node = self._parse(query)
        idf = self.resolve_idf(node, scorer)
        res = merge_topk([p for p in
                          (r.execute(node, idf, k, scorer)
                           for r in self.readers) if p[0].size], k)
        terms = collect_scorable_terms(node)
        sorted_docs = np.sort(res.doc_ids.astype(np.uint64))
        parts = _collect_rich_parts(self.readers, sorted_docs, terms)
        return res, rich_hits_table(res, parts)

    def search_sequence(self, query: str | Node, k: int = 10,
                        bonus: float = 0.5, scorer: str = "bm25",
                        index_terms: list | None = None) -> SearchResult:
        """In-engine matched-SEQUENCE proximity ranking
        (assign_query_indices/toNextSpan, queries.cpp:1048-1249):
        score(d) = base(d) + bonus * (longest contiguous matched
        query-token run - 1), computed PER SEGMENT for every matching doc
        during execution — exact at any k, no rerank pool, no driver-side
        position gather (cf. ``sequence_rerank``, the bounded-pool
        approximation).

        ``index_terms`` overrides the query-index geometry: entry j is the
        term (or tuple of ALTERNATIVE terms) occupying original query
        index j — pass ``rewrite_query(..., geometry=g)``'s collected
        geometry so rewrite-spliced synonyms score sequences as their
        source token (rewrite_ctx provenance, queries_rewrite.h:312-492).
        Default: ``assign_query_indices(node)`` — the reference geometry
        (phrases span consecutive indices, OR branches overlap, NOT
        leaves a 4-index gap, MatchSome members are excluded)."""
        node = self._parse(query)
        idf = self.resolve_idf(node, scorer)
        seq = (index_terms if index_terms is not None
               else assign_query_indices(node))
        parts = [r.execute_sequence(node, idf, seq, k, scorer, bonus)
                 for r in self.readers]
        return merge_topk([p for p in parts if p[0].size], k)


class SegmentSearchActor:
    """One actor owns a shard of segments; postings caches stay warm."""

    def __init__(self, index_dir: str, segments: list[dict],
                 masks: dict[str, np.ndarray]):
        self.readers = [
            SegmentReader(segment_dir(index_dir, s["name"]), s["doc_base"],
                          s["doc_count"], mask=masks.get(s["name"]))
            for s in segments
        ]

    def lookup_terms(self, terms: list[str]) -> dict[str, int]:
        out = {t: 0 for t in terms}
        for r in self.readers:
            for t, d in r.lookup_terms(terms).items():
                out[t] += d
        return out

    def execute(self, node: Node, idf: dict[str, float], k: int,
                scorer: str = "bm25", filter_ids: np.ndarray | None = None,
                doc_predicate=None) -> tuple[np.ndarray, np.ndarray]:
        parts = []
        for r in self.readers:
            allowed = _combine_allowed(r, filter_ids, doc_predicate)
            if allowed is not None and allowed.size == 0:
                continue
            parts.append(r.execute(node, idf, k, scorer, allowed=allowed))
        parts = [p for p in parts if p[0].size]
        merged = merge_topk(parts, k)
        return merged.doc_ids, merged.scores

    def execute_many(self, nodes: list[Node], idfs: list[dict], k: int,
                     scorer: str = "bm25"
                     ) -> list[tuple[np.ndarray, np.ndarray]]:
        return [self.execute(n, i, k, scorer) for n, i in zip(nodes, idfs)]

    def rich_hits(self, sorted_docs: np.ndarray, terms: list[str]):
        return _collect_rich_parts(self.readers, sorted_docs, terms)

    def execute_subtrees(self, node: Node, idf: dict[str, float], k: int,
                         scorer: str = "bm25"
                         ) -> tuple[np.ndarray, np.ndarray]:
        parts = [r.execute_subtrees(node, idf, k, scorer)
                 for r in self.readers]
        parts = [p for p in parts if p[0].size]
        merged = merge_topk(parts, k)
        return merged.doc_ids, merged.scores

    def execute_sequence(self, node: Node, idf: dict[str, float],
                         seq_terms: list[str], k: int,
                         scorer: str = "bm25", bonus: float = 0.5
                         ) -> tuple[np.ndarray, np.ndarray]:
        parts = [r.execute_sequence(node, idf, seq_terms, k, scorer, bonus)
                 for r in self.readers]
        parts = [p for p in parts if p[0].size]
        merged = merge_topk(parts, k)
        return merged.doc_ids, merged.scores

    def prefix_partials(self, prefix: str) -> dict[str, int]:
        """term -> df over this shard (dictionary probe, zero postings IO)."""
        acc: dict[str, int] = {}
        for r in self.readers:
            for t, df in r.prefix_terms(prefix).items():
                acc[t] = acc.get(t, 0) + df
        return acc

    def fuzzy_partials(self, term: str) -> dict[str, int]:
        """term -> df within edit distance 1 over this shard (deletion-index
        probe, zero postings IO)."""
        acc: dict[str, int] = {}
        for r in self.readers:
            for t, df in r.edit1_terms(term).items():
                acc[t] = acc.get(t, 0) + df
        return acc

    def facet_partials(self, node: Node, column: str) -> dict:
        """Per-value doc counts over this shard's match set — only the
        (value, count) dict crosses the wire, never ids or metadata."""
        import pyarrow.compute as pc

        from trinity_ray.query.exec import _setdiff

        acc: dict = {}
        for r in self.readers:
            m = r.match(node)
            if r.mask is not None and m.size:
                m = _setdiff(m, r.mask)
            if m.size == 0:
                continue
            for rec in pc.value_counts(r.doc_values(m, column)):
                v = rec["values"].as_py()
                acc[v] = acc.get(v, 0) + rec["counts"].as_py()
        return acc


class RaySearcher:
    """Scatter-gather over an actor pool (exec_query_par analogue,
    exec.h:86-177, with std::async replaced by Ray actors)."""

    def __init__(self, index_dir: str, num_actors: int = 4):
        import ray

        self.index_dir = index_dir
        self.manifest = read_manifest(index_dir)
        self.n_docs = float(self.manifest.total_stats().docs_cnt)
        self._df_cache: dict[str, int] = {}  # index is immutable per session
        masks = _segment_masks(self.manifest, index_dir)
        segs = [
            {"name": s.name, "doc_base": s.doc_base, "doc_count": s.doc_count}
            for s in self.manifest.segments
        ]
        num_actors = max(1, min(num_actors, len(segs)))
        shards = [segs[i::num_actors] for i in range(num_actors)]
        from trinity_ray.rayutil import package_runtime_env

        Actor = ray.remote(num_cpus=1, runtime_env=package_runtime_env())(SegmentSearchActor)
        self.actors = [
            Actor.remote(index_dir, shard,
                         {s["name"]: masks[s["name"]] for s in shard
                          if s["name"] in masks})
            for shard in shards
        ]
        self._ray = ray
        self._fuzzy_cache: dict[str, dict[str, int]] = {}
        self._prefix_cache: dict[str, dict[str, int]] = {}

    def _edit1_merged(self, term: str) -> dict[str, int]:
        """Neighborhood df merged across ALL shards BEFORE selection, so
        every actor executes the identical expansion (partial-df selection
        would let shards disagree on the alternative set — the same
        global-before-scoring rule as resolve_idf)."""
        hit = self._fuzzy_cache.get(term)
        if hit is None:
            hit = {}
            futs = [a.fuzzy_partials.remote(term) for a in self.actors]
            for part in self._ray.get(futs):
                for t, df in part.items():
                    hit[t] = hit.get(t, 0) + df
            self._fuzzy_cache[term] = hit
        return hit

    def _prefix_merged(self, prefix: str) -> dict[str, int]:
        """Prefix completions, df merged across ALL shards before selection
        (same rule as _edit1_merged)."""
        hit = self._prefix_cache.get(prefix)
        if hit is None:
            hit = {}
            futs = [a.prefix_partials.remote(prefix) for a in self.actors]
            for part in self._ray.get(futs):
                for t, df in part.items():
                    hit[t] = hit.get(t, 0) + df
            self._prefix_cache[prefix] = hit
        return hit

    def _parse(self, query: str | Node) -> Node:
        node = parse_query(query, self.manifest.tokenizer) \
            if isinstance(query, str) else query
        return expand_fuzzy(node, self._edit1_merged,
                            prefix_df=self._prefix_merged)

    def resolve_idf(self, node: Node, scorer: str = "bm25") -> dict[str, float]:
        terms = collect_terms(node)
        if not terms:
            return {}
        sc = get_scorer(scorer)
        missing = [t for t in terms if t not in self._df_cache]
        if missing:  # one probe round-trip per DISTINCT term per session
            futs = [a.lookup_terms.remote(missing) for a in self.actors]
            acc = {t: 0 for t in missing}
            for part in self._ray.get(futs):
                for t, d in part.items():
                    acc[t] += d
            self._df_cache.update(acc)
        wmul = collect_scorable_weights(node)
        return {t: sc.weight(float(self._df_cache[t]), self.n_docs) * w
                for t, w in wmul.items() if self._df_cache[t] > 0}

    def search(self, query: str | Node, k: int = 10,
               scorer: str = "bm25", filter_ids: np.ndarray | None = None,
               doc_predicate=None) -> SearchResult:
        """App pre-filter seams as LocalSearcher.search; ``doc_predicate``
        is evaluated actor-side over each segment's docs metadata (only the
        pickled callable ships, never the metadata)."""
        node = self._parse(query)
        idf = self.resolve_idf(node, scorer)
        futs = [a.execute.remote(node, idf, k, scorer, filter_ids,
                                 doc_predicate) for a in self.actors]
        parts = [p for p in self._ray.get(futs) if p[0].size]
        return merge_topk(parts, k)

    def search_subtrees(self, query: str | Node, k: int = 10,
                        scorer: str = "bm25") -> SearchResult:
        node = self._parse(query)
        idf = self.resolve_idf(node, scorer)
        futs = [a.execute_subtrees.remote(node, idf, k, scorer)
                for a in self.actors]
        return merge_topk([p for p in self._ray.get(futs) if p[0].size], k)

    def search_sequence(self, query: str | Node, k: int = 10,
                        bonus: float = 0.5, scorer: str = "bm25",
                        index_terms: list | None = None) -> SearchResult:
        """In-engine matched-sequence ranking: the bonus is computed
        actor-side per segment (positions never leave their actor); the
        driver merges bonused partial top-k's — exact at any k.
        ``index_terms`` as LocalSearcher.search_sequence (rewrite
        provenance geometry)."""
        node = self._parse(query)
        idf = self.resolve_idf(node, scorer)
        seq = (index_terms if index_terms is not None
               else assign_query_indices(node))
        futs = [a.execute_sequence.remote(node, idf, seq, k, scorer, bonus)
                for a in self.actors]
        return merge_topk([p for p in self._ray.get(futs) if p[0].size], k)

    def search_rich(self, query: str | Node, k: int = 10,
                    scorer: str = "bm25"):
        """Distributed rich-match: the top-k round as ``search``, then one
        targeted hit-gather round-trip per actor for ONLY the k winners
        (postings never leave their actor; the gather ships k ids + terms)."""
        node = self._parse(query)
        idf = self.resolve_idf(node, scorer)
        futs = [a.execute.remote(node, idf, k, scorer) for a in self.actors]
        res = merge_topk([p for p in self._ray.get(futs) if p[0].size], k)
        terms = collect_scorable_terms(node)
        sorted_docs = np.sort(res.doc_ids.astype(np.uint64))
        hfuts = [a.rich_hits.remote(sorted_docs, terms) for a in self.actors]
        parts = [p for chunk in self._ray.get(hfuts) for p in chunk]
        return res, rich_hits_table(res, parts)

    def suggest_terms(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Distributed dictionary prefix suggestions: per-shard term->df
        partials (zero postings IO) merged driver-side — same contract as
        LocalSearcher.suggest_terms."""
        from trinity_ray.tokenizer import get_tokenizer

        toks = get_tokenizer(self.manifest.tokenizer)(prefix)
        if len(toks) == 1:
            prefix = toks[0]
        futs = [a.prefix_partials.remote(prefix) for a in self.actors]
        acc: dict[str, int] = {}
        for part in self._ray.get(futs):
            for t, df in part.items():
                acc[t] = acc.get(t, 0) + df
        return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def fuzzy_terms(self, term: str, k: int = 10) -> list[tuple[str, int]]:
        """Distributed typo-tolerant term lookup: per-shard deletion-index
        probes merged driver-side — same contract as
        LocalSearcher.fuzzy_terms."""
        from trinity_ray.tokenizer import get_tokenizer

        toks = get_tokenizer(self.manifest.tokenizer)(term)
        if len(toks) == 1:
            term = toks[0]
        futs = [a.fuzzy_partials.remote(term) for a in self.actors]
        acc: dict[str, int] = {}
        for part in self._ray.get(futs):
            for t, df in part.items():
                acc[t] = acc.get(t, 0) + df
        return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def facet_counts(self, query: str | Node, column: str
                     ) -> list[tuple[object, int]]:
        """Distributed facet aggregation: each actor counts its shard's
        matched docs' ``column`` values segment-side; the driver merges
        value->count dicts (tiny: bounded by facet cardinality, never by
        corpus size).  Same result contract as LocalSearcher.facet_counts."""
        node = self._parse(query)
        futs = [a.facet_partials.remote(node, column) for a in self.actors]
        acc: dict = {}
        for part in self._ray.get(futs):
            for v, c in part.items():
                acc[v] = acc.get(v, 0) + c
        return sorted(acc.items(), key=lambda kv: (-kv[1], str(kv[0])))

    def search_many(self, queries: list[str | Node], k: int = 10,
                    scorer: str = "bm25") -> list[SearchResult]:
        nodes = [self._parse(q) for q in queries]
        idfs = [self.resolve_idf(n, scorer) for n in nodes]
        futs = [a.execute_many.remote(nodes, idfs, k, scorer) for a in self.actors]
        per_actor = self._ray.get(futs)
        out = []
        for qi in range(len(nodes)):
            parts = [pa[qi] for pa in per_actor if pa[qi][0].size]
            out.append(merge_topk(parts, k))
        return out


class QueryExec:
    """Batch-of-queries stage (SURVEY.md §3.3): a Dataset of query strings
    flows through an actor pool; each actor holds a full LocalSearcher
    (index loaded once in __init__) and answers its batch of queries.

    This is QUERY-parallel serving for throughput workloads over a
    servable-size index; for indexes too big for one actor's heap, use
    RaySearcher (SEGMENT-parallel scatter-gather) instead.
    """

    def __init__(self, index_dir: str, k: int = 10, scorer: str = "bm25",
                 mode: str = "topk"):
        self.searcher = LocalSearcher(index_dir)
        self.k = k
        self.scorer = scorer
        if mode not in ("topk", "rich", "subtrees", "sequence"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self._payloads: bool | None = None

    def _has_payloads(self) -> bool:
        """True iff every posting segment carries the payload channel (the
        same rule rich_hits_table applies per result) — fixes the OUTPUT
        SCHEMA per index so every block agrees, hits or not."""
        if self._payloads is None:
            import json as _json
            import os as _os

            vals = []
            for seg in self.searcher.manifest.segments:
                p = _os.path.join(self.searcher.index_dir, "segments",
                                  seg.name, "stats.json")
                try:
                    with open(p) as f:
                        st = _json.load(f)
                except (OSError, ValueError):
                    continue
                if not seg.has_deletes:
                    vals.append(bool(st.get("payloads")))
            self._payloads = bool(vals) and all(vals)
        return self._payloads

    def _normalize_rich(self, tbl):
        import pyarrow as pa

        base = {
            "rank": pa.int32(), "doc_id": pa.int64(), "score": pa.float64(),
            "term": pa.string(), "tf": pa.int64(),
            "positions": pa.list_(pa.int64()),
        }
        if self._has_payloads():
            base["payloads"] = pa.list_(pa.int64())
        if tbl is None:
            return pa.table({k: pa.array([], t) for k, t in base.items()})
        cols = {}
        for k, t in base.items():
            if k in tbl.column_names:
                cols[k] = tbl.column(k)
            else:  # zero-hit result from rich_hits_table: add typed empties
                cols[k] = pa.array([[] if pa.types.is_list(t) else None
                                    for _ in range(tbl.num_rows)], t)
        return pa.table(cols)

    def __call__(self, batch):
        import pyarrow as pa

        if self.mode == "rich":
            parts = []
            for q in batch.column("query").to_pylist():
                _res, tbl = self.searcher.search_rich(q, k=self.k,
                                                      scorer=self.scorer)
                tbl = self._normalize_rich(tbl)
                parts.append(tbl.add_column(
                    0, "query", pa.array([q] * tbl.num_rows, pa.string())))
            if not parts:  # empty input block: stable-schema empty table
                empty = self._normalize_rich(None)
                return empty.add_column(
                    0, "query", pa.array([], pa.string()))
            return pa.concat_tables(parts, promote_options="default")
        q_out, rank_out, doc_out, score_out = [], [], [], []
        for q in batch.column("query").to_pylist():
            if self.mode == "subtrees":
                res = self.searcher.search_subtrees(q, k=self.k,
                                                    scorer=self.scorer)
            elif self.mode == "sequence":
                res = self.searcher.search_sequence(q, k=self.k,
                                                    scorer=self.scorer)
            else:
                res = self.searcher.search(q, k=self.k, scorer=self.scorer)
            for rank, (d, s) in enumerate(zip(res.doc_ids, res.scores), 1):
                q_out.append(q)
                rank_out.append(rank)
                doc_out.append(int(d))
                score_out.append(float(s))
        return pa.table({
            "query": pa.array(q_out, pa.string()),
            "rank": pa.array(rank_out, pa.int32()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        })


def batch_search(queries_ds, index_dir: str, *, k: int = 10,
                 scorer: str = "bm25", batch_size: int = 64,
                 concurrency: int = 8, mode: str = "topk"):
    """(query, rank, doc_id, score) rows for a Dataset with a ``query``
    column — the Ray-Data-native high-throughput query path.  ``mode``:
    "topk" (default), "subtrees" (accumulated-score OR-of-subtrees),
    "sequence" (matched-sequence proximity bonus), or "rich" (per-term
    tf/positions/payload rows, prefixed with the query)."""
    from trinity_ray.rayutil import actor_pool, package_runtime_env

    return queries_ds.map_batches(
        QueryExec,
        fn_constructor_kwargs=dict(index_dir=index_dir, k=k, scorer=scorer,
                                   mode=mode),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env(),
    )


def longest_matched_sequence(term_positions: list[np.ndarray]) -> int:
    """Longest contiguous run of query tokens matched at adjacent positions.

    ``term_positions[i]`` = sorted positions of the i-th ORIGINAL query
    token in one document (empty = absent).  This is the user-visible core
    of the reference's assign_query_indices sequence geometry
    (queries.cpp:1048-1249: per-instance query index + toNextSpan): a run
    [j, j+L) counts when token j+i appears at position p+i for every i.
    """
    n = len(term_positions)
    best = min(1, sum(1 for p in term_positions if p.size))
    for j in range(n):
        if not term_positions[j].size:
            continue
        # chain sets: positions where a run starting at j reaches length L
        chain = term_positions[j]
        L = 1
        while j + L < n and chain.size:
            nxt = term_positions[j + L]
            if not nxt.size:
                break
            chain = chain[np.isin(chain + 1, nxt)] + 1
            if chain.size:
                L += 1
        best = max(best, L)
    return best


def sequence_rerank(searcher, query: str, k: int = 10, pool: int = 50,
                    bonus: float = 0.5, scorer: str = "bm25") -> SearchResult:
    """Two-phase proximity ranking: BM25 top-``pool`` candidates, then
    re-rank by score + bonus * (longest matched query-token sequence - 1).

    Adjacent-in-query tokens matched at adjacent positions outrank bags of
    the same tokens — the matched-SEQUENCE scoring the reference builds
    assign_query_indices / toNextSpan geometry for, expressed over the
    rich-match positions instead of iterator spans.  Ties keep
    (score desc, doc_id asc)."""
    res, tbl = searcher.search_rich(query, k=pool, scorer=scorer)
    if res.doc_ids.size == 0:
        return res
    # ordered distinct query tokens from the PARSED query (operator words
    # like AND/OR/NOT are syntax, not sequence members) — the
    # assign_query_indices "index within the original query"
    node = searcher._parse(query)
    seen = collect_scorable_terms(node)
    by_doc: dict[int, dict[str, np.ndarray]] = {}
    for d, t, p in zip(tbl.column("doc_id").to_pylist(),
                       tbl.column("term").to_pylist(),
                       tbl.column("positions").to_pylist()):
        by_doc.setdefault(int(d), {})[t] = np.asarray(p, dtype=np.int64)
    empty = np.empty(0, dtype=np.int64)
    scores = res.scores.copy()
    for i, d in enumerate(res.doc_ids):
        tp = by_doc.get(int(d), {})
        L = longest_matched_sequence([tp.get(t, empty) for t in seen])
        scores[i] = scores[i] + bonus * (L - 1)
    order = np.lexsort((res.doc_ids, -scores))[:k]
    return SearchResult(res.doc_ids[order], scores[order])


def more_like_this(searcher, text: str, *, k: int = 10, n_terms: int = 5,
                   exclude_doc_id: int | None = None,
                   scorer: str = "bm25") -> SearchResult:
    """Similar-document search from a seed text (the Lucene MoreLikeThis
    shape): tokenize the seed with the index tokenizer, score its
    DISTINCT terms by seed-tf / global-df (the keywords_tfdf burstiness
    rule, df read from the DICTIONARY — zero postings IO for term
    selection), take the top ``n_terms`` by (score desc, term asc), and
    run their OR as a standard scored query.  ``exclude_doc_id`` masks
    the seed document itself via the doc-predicate seam (collection
    stats untouched, like delete masks — index_source.h:199-216).

    The whole pipeline is index-native: term selection costs n dictionary
    lookups, matching/scoring is the ordinary cost-ordered OR execution.
    """
    from collections import Counter

    from trinity_ray.tokenizer import get_tokenizer

    toks = get_tokenizer(searcher.manifest.tokenizer)(text or "")
    if not toks:
        return SearchResult(np.empty(0, np.uint64), np.empty(0, np.float64))
    tf = Counter(toks)
    terms = sorted(tf)
    df: dict[str, int] = {t: 0 for t in terms}
    for r in searcher.readers:
        for t, d in r.lookup_terms(terms).items():
            df[t] += d
    scored = [(tf[t] / df[t], t) for t in terms if df[t] > 0]
    scored.sort(key=lambda st: (-st[0], st[1]))
    chosen = [t for _, t in scored[:max(1, int(n_terms))]]
    if not chosen:
        return SearchResult(np.empty(0, np.uint64), np.empty(0, np.float64))
    query = " OR ".join(chosen)
    pred = None
    if exclude_doc_id is not None:
        ex = int(exclude_doc_id)

        def pred(docs):                     # noqa: E306
            return docs.column("doc_id").to_numpy() != ex

    return searcher.search(query, k=k, scorer=scorer, doc_predicate=pred)
