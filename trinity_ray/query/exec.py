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

Two skiplist-style refinements on top of the full-decode baseline:

* **selective block gather** — when a candidate set is much smaller than a
  term's df, tf lookup / membership decodes only the candidates' blocks
  (searchsorted on the blob's last_docid directory = the reference's
  ``advance(target)`` skiplist seek, google_codec.cpp:146-158);
* **max-score / block-max WAND pruning** — scored flat disjunctions
  (Token / OR-of-Tokens, the BM25 top-k hot path) run a TAAT max-score
  loop: terms processed in descending upper-bound order
  (``scorer.bound(w, max_tf)`` from the codec's block-max directory);
  once the remaining terms' bound sum cannot lift a *new* doc past the
  current kth score, tail terms only refine surviving candidates via
  selective block gather.  Survivors are re-scored canonically, so results
  are bit-identical to the exhaustive path (verified by property tests).

Scoring is pluggable (scorers.py); default is the reference BM25 with the
length norm stubbed to k1 (similarity.h:165-255):
score(d) = sum_t idf_t * tf/(tf + k1), idf_t = ln(1 + (N - df + 0.5)/(df + 0.5)),
k1 = 1.2, df/N GLOBAL across segments (summed in reset(),
similarity.h:238-250) — never partial-idf, so cross-partition results are
rank-identical to a single-node run.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.dataset as pads

from trinity_ray.codec import BLOCK, PostingsBlob
from trinity_ray.index.segment import segment_postings_files
from trinity_ray.query.ast import (
    And,
    ConstFalse,
    MatchAll,
    MatchSome,
    Near,
    Node,
    Not,
    Optional_,
    Or,
    Phrase,
    Token,
)
from trinity_ray.query.scorers import K1, Scorer, get_scorer

_POS_SHIFT = 15  # > log2(MAX_POSITION)+1 headroom for pos+phrase-offset keys
_EAGER_DICT_MAX = 262_144  # terms; above this, probe via row-group pruning
_RG_CACHE_MAX = 512        # dictionary row groups resident per reader (LRU)
_PRUNE_EPS = 1e-9  # float-associativity slack for max-score bounds
_PRED_CACHE_MAX = 64  # DocPredicate id-set cache entries per SegmentReader
_DOCVAL_CACHE_MAX = 4  # facet-column (doc_id, values) tables per reader

EMPTY_U64 = np.empty(0, dtype=np.uint64)
EMPTY_F64 = np.empty(0, dtype=np.float64)


def bm25_idf(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    """idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — similarity.h:179-181."""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


class DocPredicate:
    """Declarative app-side metadata predicate (the IndexDocumentsFilter
    seam, matches.h:188-201, made storage-aware):

    - ``columns``: the docs-metadata columns the predicate touches — the
      per-query read is pruned to these (plus doc_id) instead of the full
      table;
    - ``filter``: optional ``pyarrow.dataset`` expression pushed down to
      the Parquet scan, so row-group statistics skip non-matching groups
      before any IO;
    - ``fn``: optional callable refinement over the pruned table
      (rows the expression admitted) returning a boolean mask;
    - ``key``: stable identity for per-(segment, predicate) caching of
      the qualifying id set — repeated queries carrying the same
      predicate never re-read docs metadata (defaults to the filter's
      string form when only a filter is given; REQUIRED with ``fn`` since
      callables have no stable identity across pickling).

    Plain callables remain accepted everywhere a predicate is (legacy
    seam, full-column uncached read).
    """

    __slots__ = ("fn", "columns", "filter", "key")

    def __init__(self, fn=None, *, columns: list[str] | None = None,
                 filter=None, key: str | None = None):
        if fn is None and filter is None:
            raise ValueError("DocPredicate needs fn and/or filter")
        if fn is not None and key is None:
            raise ValueError(
                "DocPredicate with a callable needs an explicit key= for "
                "caching identity")
        self.fn = fn
        self.columns = list(columns or [])
        self.filter = filter
        # fold the declared columns into the cache identity: two
        # explicit-key predicates that differ only in columns= (so fn sees
        # different inputs) must never share a cache slot
        base = key if key is not None else f"expr:{filter}"
        self.key = f"{base}|cols:{','.join(self.columns)}"

    def ids(self, t, *, prefiltered: bool = False) -> np.ndarray:
        """Sorted qualifying doc_ids from a docs-metadata table — the ONE
        evaluation path shared by durable and in-memory segments, so fn
        always sees the same pruned shape (doc_id + declared columns).
        ``prefiltered``: the table already went through ``filter`` (a
        storage-level scan pushdown)."""
        if self.filter is not None and not prefiltered:
            t = t.filter(self.filter)
        missing = [c for c in self.columns if c not in t.column_names]
        if missing:
            # consistent with the durable path (whose pruned Parquet scan
            # raises on unknown columns): a declared column that a segment
            # lacks is a schema error, never a silently-narrower fn input
            raise KeyError(
                f"DocPredicate column(s) {missing} not in docs metadata "
                f"(has {t.column_names})")
        cols = ["doc_id"] + [c for c in self.columns if c != "doc_id"]
        t = t.select(cols)
        mask = (np.asarray(self.fn(t), dtype=bool) if self.fn is not None
                else np.ones(t.num_rows, dtype=bool))
        return np.sort(t.column("doc_id").to_numpy().astype(np.uint64)[mask])


class TermPostings:
    """Lazily-loaded view over one term's postings.

    The dictionary probe (df / max_tf lookup) touches NO postings bytes at
    all — both come from the terms dictionary (term_index_ctx analogue,
    codecs.h:17-55); the blob is read from postings.bin as one exact byte
    range on first real access, full doc/freq decode happens on first
    ``doc_ids``/``freqs`` use, and the selective paths
    (``gather_tfs``/``member``) decode single blocks through the skiplist
    directory without ever materializing the full list.
    """

    __slots__ = ("_df", "_max_tf", "_loader", "_hits_loader", "_blob",
                 "_docs", "_freqs", "_pos", "_pay", "_blocks", "_blocks_pos",
                 "_local64", "_tf64", "_contrib")

    def __init__(self, df: int, max_tf: int, loader, hits_loader=None):
        self._df = int(df)
        self._max_tf = int(max_tf)
        self._loader = loader  # () -> bytes (exact range read) or raw bytes
        self._hits_loader = hits_loader  # () -> positions+payloads range
        self._blob: PostingsBlob | None = None
        self._docs: np.ndarray | None = None
        self._freqs: np.ndarray | None = None
        self._pos: tuple[np.ndarray, np.ndarray] | None = None
        self._pay: tuple[np.ndarray, np.ndarray] | None = None
        self._blocks: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._blocks_pos: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._local64: np.ndarray | None = None
        self._tf64: np.ndarray | None = None
        self._contrib: tuple | None = None  # ((scorer, w), per-doc scores)

    @property
    def blob(self) -> PostingsBlob:
        if self._blob is None:
            raw = self._loader() if callable(self._loader) else self._loader
            self._blob = PostingsBlob(raw, hits_loader=self._hits_loader)
        return self._blob

    @property
    def df(self) -> int:
        return self._df

    @property
    def max_tf(self) -> int:
        return self._max_tf

    def _decode(self) -> None:
        if self._docs is None:
            self._docs, self._freqs = self.blob.decode_docs_freqs()

    @property
    def doc_ids(self) -> np.ndarray:
        self._decode()
        return self._docs

    @property
    def freqs(self) -> np.ndarray:
        self._decode()
        return self._freqs

    def local_idx(self, base) -> np.ndarray:
        """``(doc_ids - base)`` as int64, cached — the dense-scatter index
        ``score()`` uses every query.  A TermPostings belongs to exactly
        one segment so ``base`` should never vary, but the cache records
        it and recomputes on mismatch rather than trusting callers."""
        if self._local64 is None or self._local64[0] != base:
            self._local64 = (base, (self.doc_ids - base).astype(np.int64))
        return self._local64[1]

    def tf64(self) -> np.ndarray:
        """``freqs`` as float64, cached (scorer input)."""
        if self._tf64 is None:
            self._tf64 = self.freqs.astype(np.float64)
        return self._tf64

    def contrib(self, sc, w: float) -> np.ndarray:
        """Per-posting score contributions ``sc.contrib(w, tf)``, cached
        single-slot: a term's weight is fixed for a searcher session
        (global df), so repeated queries re-add the same vector — the
        impact-cache shape of serving pools.  Keyed on the Scorer INSTANCE
        (held alive by the cache, so identity is stable): two scorers
        sharing a name but different contrib functions never serve each
        other's vectors.  Callers must not mutate."""
        if (self._contrib is None or self._contrib[0] is not sc
                or self._contrib[1] != w):
            self._contrib = (sc, w, sc.contrib(w, self.tf64()))
        return self._contrib[2]

    def positions(self) -> tuple[np.ndarray, np.ndarray]:
        if self._pos is None:
            if not self.blob.has_positions:
                raise ValueError("no positions available")
            self._pos = self.blob.decode_positions(self.freqs)
        return self._pos

    def payloads(self) -> tuple[np.ndarray, np.ndarray]:
        if self._pay is None:
            if not self.blob.payload_width:
                raise ValueError("no payloads available")
            self._pay = self.blob.decode_payloads(self.freqs)
        return self._pay

    def gather_payloads(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(pay_flat, lens) per candidate — mirrors gather_positions for the
        per-hit <=8-byte opaque payload channel (codecs.h:194-195).  Every
        candidate must be present in this posting list."""
        pay, offs = self.payloads()
        idx = np.searchsorted(self.doc_ids, cand)
        starts = offs[idx]
        lens = offs[idx + 1] - starts
        return pay[_range_gather(starts, lens)], lens

    # -- skiplist-selective access ------------------------------------------
    def _use_selective(self, n_cand: int) -> bool:
        """Selective block decode pays off when candidate blocks cover much
        less than the full list (2x hysteresis for the directory overhead)."""
        return self._docs is None and n_cand * BLOCK * 2 < self.df

    def gather_tfs(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(tf, found) for a sorted candidate doc array; tf is float64 with
        0 where not found."""
        tf = np.zeros(cand.size, dtype=np.float64)
        found = np.zeros(cand.size, dtype=bool)
        if cand.size == 0 or self.df == 0:
            return tf, found
        if not self._use_selective(cand.size):
            d, f = self.doc_ids, self.freqs
            idx = np.searchsorted(d, cand)
            idx_c = np.minimum(idx, d.size - 1)
            found = d[idx_c] == cand
            tf[found] = f[idx_c[found]].astype(np.float64)
            return tf, found
        blob = self.blob
        bidx = np.searchsorted(blob.last_docid, cand)  # advance() seek
        valid = bidx < blob.n_blocks
        for b in np.unique(bidx[valid]):
            blk = self._blocks.get(int(b))
            if blk is None:
                blk = blob.decode_block(int(b))
                self._blocks[int(b)] = blk
            d, f = blk
            sel = valid & (bidx == b)
            idx = np.searchsorted(d, cand[sel])
            idx_c = np.minimum(idx, d.size - 1)
            hit = d[idx_c] == cand[sel]
            where = np.flatnonzero(sel)
            found[where[hit]] = True
            tf[where[hit]] = f[idx_c[hit]].astype(np.float64)
        return tf, found

    def member(self, cand: np.ndarray) -> np.ndarray:
        """Boolean membership of sorted candidates (skiplist leapfrog)."""
        if not self._use_selective(cand.size):
            return _member(cand, self.doc_ids)
        _, found = self.gather_tfs(cand)
        return found

    def _block(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        blk = self._blocks.get(b)
        if blk is None:
            blk = self.blob.decode_block(b)
            self._blocks[b] = blk
        return blk

    def gather_positions(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(pos_flat, lens): concatenated per-candidate positions, cand order.

        Every candidate must be present in this posting list (phrase
        verification runs after the candidate intersection).  Selective
        path decodes only the candidates' blocks — the position analogue of
        the reference's per-block ``materialize_hits``."""
        if self._pos is not None or not self.blob.has_positions \
                or not self._use_selective(cand.size):
            pos, offs = self.positions()
            idx = np.searchsorted(self.doc_ids, cand)
            starts = offs[idx]
            lens = offs[idx + 1] - starts
            return pos[_range_gather(starts, lens)], lens
        blob = self.blob
        bidx = np.searchsorted(blob.last_docid, cand)
        pos_parts: list[np.ndarray] = []
        lens = np.zeros(cand.size, dtype=np.int64)
        for b in np.unique(bidx):  # ascending; cand sorted => output in order
            docs, freqs = self._block(int(b))
            pblk = self._blocks_pos.get(int(b))
            if pblk is None:
                pblk = blob.decode_block_positions(int(b), freqs)
                self._blocks_pos[int(b)] = pblk
            ppos, poffs = pblk
            sel = np.flatnonzero(bidx == b)
            idx = np.searchsorted(docs, cand[sel])
            starts = poffs[idx]
            l = poffs[idx + 1] - starts
            pos_parts.append(ppos[_range_gather(starts, l)])
            lens[sel] = l
        flat = (np.concatenate(pos_parts) if pos_parts
                else np.empty(0, dtype=np.uint64))
        return flat, lens


def _del1_variants(t: str) -> list[str]:
    """The term plus every string obtained by deleting one character —
    the SymSpell symmetric-delete neighborhood for max_edits=1."""
    return [t] + [t[:i] + t[i + 1:] for i in range(len(t))]


def _edit1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 (no transpositions, matching SQL
    levenshtein()): identity, one substitution, or one insert/delete."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


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
        self._files = segment_postings_files(seg_path)  # [] = deletes-only
        if not self._files and os.path.exists(
                os.path.join(seg_path, "postings.parquet")):
            # legacy format-1 layout: without this check it would be
            # indistinguishable from a deletes-only segment and every query
            # would silently return empty (ADVICE r1)
            raise ValueError(
                f"segment {seg_path} uses the retired format-1 layout "
                "(postings.parquet); rebuild the index with the current "
                "version")
        if self._files:
            from trinity_ray.index.segment import require_segment_format

            require_segment_format(seg_path, who="reader")
        # term -> (df, max_tf, sum_hits, off, len, hoff, hlen)
        self._dict: dict[str, tuple[int, int, int, int, int, int, int]] | None = None
        self._rg_index: list[tuple[str, str, int, int]] | None = None
        self._rg_cache: dict[tuple[int, int], object] = {}  # -> pa.Table
        self._handles: dict[object, object] = {}  # fi | ("hits"|"terms", fi)
        self._universe: np.ndarray | None = None
        self._cache: dict[str, TermPostings | None] = {}
        self._sorted_terms: list[str] | None = None
        self._pred_cache: dict[str, np.ndarray] = {}  # DocPredicate.key -> ids
        self._docval_cache: dict = {}  # column -> (doc_ids, values)
        self._del_index: dict[str, list[tuple[str, int]]] | None = None

    # -- dictionary probe ----------------------------------------------------
    def _ensure_dict(self) -> None:
        """Prepare the term dictionary: term -> (df, max_tf, file_idx, off,
        len).  Small dictionaries load eagerly ONCE per reader (the
        SegmentTerms load of segment_index_source.cpp:5-186); huge ones keep
        only a row-group [min_term, max_term] index and decode single row
        groups on demand — the every-64-terms skiplist of terms.cpp:8-103,
        with parquet row-group statistics as the skiplist entries."""
        if self._dict is not None or self._rg_index is not None:
            return
        import pyarrow.parquet as pq

        metas = [pq.read_metadata(tp) for tp, _ in self._files]
        total = sum(m.num_rows for m in metas)
        if total <= _EAGER_DICT_MAX:
            d: dict[str, tuple[int, int, int, int, int, int, int]] = {}
            for fi, (terms_path, _bin) in enumerate(self._files):
                t = pq.read_table(terms_path)
                for term, df, mtf, off, ln, hoff, hlen in zip(
                        t.column("term").to_pylist(),
                        t.column("df").to_pylist(),
                        t.column("max_tf").to_pylist(),
                        t.column("off").to_pylist(),
                        t.column("len").to_pylist(),
                        t.column("hoff").to_pylist(),
                        t.column("hlen").to_pylist()):
                    d[term] = (df, mtf, fi, off, ln, hoff, hlen)
            self._dict = d
            return
        rg_index: list[tuple[str, str, int, int]] = []  # (min, max, fi, rg)
        for fi, md in enumerate(metas):
            term_col = next(
                j for j in range(md.row_group(0).num_columns)
                if md.row_group(0).column(j).path_in_schema == "term")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(term_col).statistics
                rg_index.append((st.min, st.max, fi, rg))
        # row-group ranges are sorted-by-min but NOT necessarily disjoint:
        # a merged segment's "boundary" shard spans the whole term space
        # (its rows are each sort-block's first/last term), so the bisect
        # hit is only the LAST candidate.  A prefix-max over the range maxes
        # lets the probe walk left exactly as far as any range could still
        # contain the term — the every-64-terms skiplist of terms.cpp:8-103
        # generalized to overlapping shards.
        rg_index.sort(key=lambda e: e[0])
        self._rg_index = rg_index
        self._rg_mins = [e[0] for e in rg_index]
        pm: list[str] = []
        cur = ""
        for _lo, hi, _fi, _rg in rg_index:
            if hi > cur:
                cur = hi
            pm.append(cur)
        self._rg_prefix_max = pm

    def _probe(self, term: str
               ) -> tuple[int, int, int, int, int, int, int] | None:
        self._ensure_dict()
        if self._dict is not None:
            return self._dict.get(term)
        import bisect

        j = bisect.bisect_right(self._rg_mins, term) - 1
        # every j' <= j has min <= term; walk left while the prefix-max says
        # some range there could still reach term (overlapping boundary
        # shards make >1 candidate possible; a term lives in exactly one)
        while j >= 0 and self._rg_prefix_max[j] >= term:
            lo, hi, fi, rg = self._rg_index[j]
            if lo <= term <= hi:
                hit = self._probe_rg(fi, rg, term)
                if hit is not None:
                    return hit
            j -= 1
        return None

    def _load_rg_table(self, fi: int, rg: int):
        """One decoded dictionary row group, cached as the Arrow table —
        NOT a Python dict: materializing 7 pylist columns x TERMS_ROW_GROUP
        rows cost ~10 ms per probe miss (the p95 of fresh-term lookups on a
        >256k-term dictionary), vs ~1.5 ms for the decode alone."""
        key = (fi, rg)
        t = self._rg_cache.get(key)
        if t is None:
            import pyarrow.parquet as pq

            # cache the ParquetFile too: re-opening re-parses the footer
            # metadata (hundreds of row groups) on every miss
            pf = self._handles.get(("terms", fi))
            if pf is None:
                pf = pq.ParquetFile(self._files[fi][0])
                self._handles[("terms", fi)] = pf
            t = pf.read_row_group(rg)
            # bound the cache: a long-lived serving actor probing a broad
            # term space would otherwise pin every touched row group
            # (~2360 groups x ~150 KB on a 1.2M-term dictionary).  LRU via
            # dict move-to-end; hot groups stay resident.
            if len(self._rg_cache) >= _RG_CACHE_MAX:
                self._rg_cache.pop(next(iter(self._rg_cache)))
            self._rg_cache[key] = t
        else:
            self._rg_cache.pop(key)          # move-to-end = LRU touch
            self._rg_cache[key] = t
        return t

    def _probe_rg(self, fi: int, rg: int, term: str
                  ) -> tuple[int, int, int, int, int, int, int] | None:
        """Single-term probe of one row group: C-side value scan + one-row
        extract.  Distinct terms are memoized downstream in self._cache, so
        each term pays this at most once per reader."""
        import pyarrow.compute as pc

        t = self._load_rg_table(fi, rg)
        i = pc.index(t.column("term"), term).as_py()
        if i < 0:
            return None
        df, mtf, off, ln, hoff, hlen = (
            t.column(c)[i].as_py()
            for c in ("df", "max_tf", "off", "len", "hoff", "hlen"))
        return (df, mtf, fi, off, ln, hoff, hlen)

    def _read_blob(self, fi: int, off: int, ln: int) -> bytes:
        fh = self._handles.get(fi)
        if fh is None:
            fh = open(self._files[fi][1], "rb")
            self._handles[fi] = fh
        fh.seek(off)
        return fh.read(ln)

    def _read_hits(self, fi: int, hoff: int, hlen: int) -> bytes:
        """Exact positions+payloads byte range from the sibling hits file —
        opened (and read) only when a positional/payload query needs it."""
        from trinity_ray.index.segment import hits_path

        key = ("hits", fi)
        fh = self._handles.get(key)
        if fh is None:
            fh = open(hits_path(self._files[fi][1]), "rb")
            self._handles[key] = fh
        fh.seek(hoff)
        return fh.read(hlen)

    def close(self) -> None:
        """Release postings.bin file handles (long-lived serving actors
        hold one per shard otherwise)."""
        for fh in self._handles.values():
            try:
                fh.close()
            except OSError:
                pass
        self._handles.clear()

    def __del__(self):  # best-effort; close() is the real API
        self.close()

    def lookup_terms(self, terms: list[str]) -> dict[str, int]:
        """df per term (0 if absent) — resolve_term_ctx analogue; dictionary
        only, zero postings IO."""
        out = {}
        for t in terms:
            if t not in self._cache:
                ent = self._probe(t)
                if ent is None:
                    self._cache[t] = None
                else:
                    df, mtf, fi, off, ln, hoff, hlen = ent
                    self._cache[t] = TermPostings(
                        df, mtf,
                        (lambda fi=fi, off=off, ln=ln:
                         self._read_blob(fi, off, ln)),
                        (lambda fi=fi, hoff=hoff, hlen=hlen:
                         self._read_hits(fi, hoff, hlen)))
            tp = self._cache[t]
            out[t] = 0 if tp is None else tp.df
        return out

    def prefix_terms(self, prefix: str) -> dict[str, int]:
        """term -> df for every dictionary term starting with ``prefix`` —
        the sorted-dictionary prefix scan (terms.cpp prefix iteration over
        the skiplist): eager dicts bisect a sorted key list to the
        [prefix, prefix+1) slice; lazy dicts decode only the row groups
        whose [min,max] range intersects it, WITHOUT populating the probe
        cache (a handful of prefix scans must not pin the whole dictionary
        the lazy mode exists to avoid).  Dictionary only, zero postings IO."""
        if not prefix:
            raise ValueError("empty prefix")
        self._ensure_dict()
        last = prefix[-1]
        hi = (prefix[:-1] + chr(ord(last) + 1)
              if ord(last) < 0x10FFFF else None)  # None = no upper bound
        out: dict[str, int] = {}
        if self._dict is not None:
            import bisect

            if self._sorted_terms is None:
                self._sorted_terms = sorted(self._dict)
            ks = self._sorted_terms
            lo_i = bisect.bisect_left(ks, prefix)
            hi_i = bisect.bisect_left(ks, hi) if hi is not None else len(ks)
            for t in ks[lo_i:hi_i]:
                out[t] = self._dict[t][0]
            return out
        for lo_t, hi_t, fi, rg in self._rg_index:
            if (hi is None or lo_t < hi) and hi_t >= prefix:
                cached = (fi, rg) in self._rg_cache
                tbl = self._load_rg_table(fi, rg)
                for t, df in zip(tbl.column("term").to_pylist(),
                                 tbl.column("df").to_pylist()):
                    if t.startswith(prefix):
                        out[t] = df
                if not cached:
                    self._rg_cache.pop((fi, rg), None)  # scan, don't pin
        return out

    def _iter_terms(self):
        """Yield every (term, df) in this segment's dictionary — one full
        sorted-dictionary sweep (eager dicts iterate the loaded map; lazy
        dicts stream each row group once WITHOUT pinning it in the probe
        cache).  Used only by one-time sidecar builds (fuzzy deletion
        index); query paths never call it."""
        self._ensure_dict()
        if self._dict is not None:
            for t, v in self._dict.items():
                yield t, v[0]
            return
        for _lo, _hi, fi, rg in self._rg_index:
            cached = (fi, rg) in self._rg_cache
            tbl = self._load_rg_table(fi, rg)
            yield from zip(tbl.column("term").to_pylist(),
                           tbl.column("df").to_pylist())
            if not cached:
                self._rg_cache.pop((fi, rg), None)

    def edit1_terms(self, term: str) -> dict[str, int]:
        """term -> df for dictionary terms within Levenshtein distance 1 of
        ``term`` (identity / substitution / insertion / deletion) — the
        fuzzy single-term probe behind did-you-mean / typo-tolerant search.

        SymSpell-style deletion neighborhood (Garbe's symmetric delete):
        a sidecar index maps every dictionary term's 1-deletion variants
        (plus the term itself) to the term; a probe looks up the query's
        own deletion variants and exact-verifies the candidate union, so
        probe cost is O(len(term)) lookups + a handful of verifies, never
        a dictionary scan.  The sidecar is built lazily ONCE per reader
        (one dictionary sweep, O(V * avg_len) memory) and reused across
        queries; at 10^9-term scale it would be persisted next to
        terms.parquet at build time instead — the probe path is unchanged.
        Zero postings IO either way."""
        if not term:
            raise ValueError("empty term")
        idx = self._del_index
        if idx is None:
            idx = {}
            for t, df in self._iter_terms():
                for v in _del1_variants(t):
                    idx.setdefault(v, []).append((t, df))
            self._del_index = idx
        out: dict[str, int] = {}
        for v in _del1_variants(term):
            for t, df in idx.get(v, ()):
                if t not in out and _edit1(term, t):
                    out[t] = df
        return out

    def postings(self, term: str) -> TermPostings | None:
        if term not in self._cache:
            self.lookup_terms([term])
        return self._cache[term]

    def universe(self) -> np.ndarray:
        """All live docIDs.  Built segments are dense ranges; merged segments
        may have holes where deletes were applied, so prefer docs.parquet."""
        if self._universe is None:
            docs_path = os.path.join(self.seg_path, "docs.parquet")
            docs_dir = os.path.join(self.seg_path, "docs")  # merged: sharded
            if os.path.exists(docs_path) or os.path.isdir(docs_dir):
                src = docs_path if os.path.exists(docs_path) else docs_dir
                ids = pads.dataset(src, format="parquet").to_table(
                    columns=["doc_id"]).column("doc_id")
                self._universe = np.sort(ids.to_numpy().astype(np.uint64))
            else:
                self._universe = np.arange(
                    self.doc_base, self.doc_base + self.doc_count, dtype=np.uint64
                )
        return self._universe

    def rich_hits(self, docs: np.ndarray, terms: list[str]
                  ) -> list[tuple[str, np.ndarray, np.ndarray,
                                  np.ndarray, np.ndarray]]:
        """Per-term hit detail for a sorted doc array — the reference's
        DEFAULT rich-match output (matched_document per-term term_hits,
        matches.h:139-186; materialize_hits, queryexec_ctx.cpp:535+):
        for each query term present in a doc, its tf and positions.

        Returns [(term, found_idx_into_docs, tf_int, pos_flat, lens,
        pay_flat_or_None)] — ``pay_flat`` carries the per-hit <=8-byte
        payloads (codecs.h:194-195) when the index stores them.
        Docs absent from a term's postings simply don't appear for that
        term (OR-matched docs carry only the terms they contain)."""
        out = []
        for t in dict.fromkeys(terms):
            tp = self.postings(t)
            if tp is None or docs.size == 0:
                continue
            tf, found = tp.gather_tfs(docs)
            if not found.any():
                continue
            sub = docs[found]
            if tp.blob.has_positions:
                pos_flat, lens = tp.gather_positions(sub)
            else:
                pos_flat = np.empty(0, dtype=np.uint64)
                lens = np.zeros(sub.size, dtype=np.int64)
            pay_flat = (tp.gather_payloads(sub)[0]
                        if tp.blob.payload_width else None)
            out.append((t, np.flatnonzero(found),
                        tf[found].astype(np.int64), pos_flat, lens, pay_flat))
        return out

    def doc_ids_where(self, predicate) -> np.ndarray:
        """Sorted doc_ids whose metadata row satisfies ``predicate`` — the
        IndexDocumentsFilter seam (matches.h:188-201).

        ``predicate`` is either a plain callable taking the segment's docs
        table (doc_id, id columns, content_sha256, doc_len) and returning a
        boolean mask — legacy seam, full-column read — or a
        :class:`DocPredicate`, which prunes the read to the columns it
        declares, pushes an optional Arrow expression filter down to the
        Parquet scan (row-group statistics skip non-matching groups), and
        caches the qualifying id set per (segment, predicate.key) so a
        repeated query never re-reads docs metadata.  Evaluated
        segment-side so only the id set, never the metadata, reaches the
        query plan."""
        key = getattr(predicate, "key", None)
        if key is not None:
            cached = self._pred_cache.get(key)
            if cached is not None:
                return cached
        src = self._docs_source()
        if src is None:
            # deletes-only segment: no docs of its own
            return EMPTY_U64
        if isinstance(predicate, DocPredicate):
            cols = ["doc_id"] + [c for c in predicate.columns
                                 if c != "doc_id"]
            dset = pads.dataset(src, format="parquet")
            missing = [c for c in cols if c not in dset.schema.names]
            if missing:  # same error shape as DocPredicate.ids on a RAM
                # segment: a declared column absent from this segment's
                # docs schema is a schema error, not a scan-time surprise
                raise KeyError(
                    f"DocPredicate column(s) {missing} not in docs "
                    f"metadata (has {dset.schema.names})")
            t = dset.to_table(columns=cols, filter=predicate.filter)
            out = predicate.ids(t, prefiltered=True)
        else:
            t = pads.dataset(src, format="parquet").to_table()
            mask = np.asarray(predicate(t), dtype=bool)
            out = np.sort(
                t.column("doc_id").to_numpy().astype(np.uint64)[mask])
        if key is not None:
            if len(self._pred_cache) >= _PRED_CACHE_MAX:
                # FIFO bound: per-query keys (e.g. a timestamp in the
                # filter expression) must not grow a long-lived actor's
                # memory without limit
                self._pred_cache.pop(next(iter(self._pred_cache)))
            # freeze: the cached ndarray is handed out by reference on
            # every later query of this long-lived actor — a caller
            # mutating it must fail loudly, not corrupt the cache
            out.flags.writeable = False
            self._pred_cache[key] = out
        return out

    def _docs_source(self) -> str | None:
        """Path of this segment's docs metadata (file or dir), or None for
        a deletes-only segment that carries no docs of its own."""
        docs_path = os.path.join(self.seg_path, "docs.parquet")
        if os.path.exists(docs_path):
            return docs_path
        docs_dir = os.path.join(self.seg_path, "docs")
        return docs_dir if os.path.isdir(docs_dir) else None

    def doc_values(self, ids: np.ndarray, column: str):
        """Docs-metadata ``column`` values for the given sorted doc_ids —
        the matched-document consumer seam (the reference's rich match
        hands the app a matched_document it can read app fields from,
        exec.h:11-43).  Pruned read: only doc_id + the one column leave
        storage, cached per column on this long-lived reader (repeated
        facet queries pay zero further metadata IO); order of the
        returned values is docs-table order, which is all aggregation
        consumers (facets) need.  A deletes-only segment (no docs of its
        own) returns empty for ANY column — an unknown column only raises
        on segments that actually carry docs metadata."""
        import pyarrow as _pa

        src = self._docs_source()
        if src is None:
            return _pa.chunked_array([[]], type=_pa.null())
        cached = self._docval_cache.get(column)
        if cached is None:
            dset = pads.dataset(src, format="parquet")
            if column not in dset.schema.names:
                raise KeyError(f"docs metadata has no column {column!r} "
                               f"(has {dset.schema.names})")
            t = dset.to_table(columns=["doc_id", column])
            if len(self._docval_cache) >= _DOCVAL_CACHE_MAX:
                self._docval_cache.pop(next(iter(self._docval_cache)))
            cached = (t.column("doc_id").to_numpy().astype(np.uint64),
                      t.column(column))
            self._docval_cache[column] = cached
        d, vals = cached
        return vals.filter(_pa.array(_member(d, ids)))

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
        if isinstance(node, Near):   # before Phrase: Near subclasses it
            return self._match_near(node.terms, node.window)
        if isinstance(node, Phrase):
            return self._match_phrase(node.terms)
        if isinstance(node, Not):
            return _setdiff(self.universe(), self.match(node.child))
        if isinstance(node, Optional_):
            return self.universe()
        if isinstance(node, And):
            return self._match_and(node)
        if isinstance(node, Or):
            return self._union_count(node.children, 1)
        if isinstance(node, MatchSome):
            return self._union_count(node.children, node.min_match)
        raise TypeError(f"unknown node {node!r}")

    def _union_count(self, children, k: int) -> np.ndarray:
        """docIDs matching >= k of ``children`` (k=1 == sorted union).

        Dense path: when the segment's docID span is comparable to the
        hit volume, a bincount over (id - doc_base) beats the O(N log N)
        sort of np.unique — the 8K-window bitmap counting of
        DocsSetSpanForDisjunctions (docset_spans.cpp) with the window as
        the whole segment.  Sparse spans (a merged segment over a huge id
        space) keep the sort path.  Token children contribute their
        CACHED local-index arrays directly (no per-query base-subtract
        pass over hot posting lists)."""
        base = np.uint64(self.doc_base)
        parts: list[np.ndarray] = []  # int64 segment-local ids
        for c in children:
            if isinstance(c, Token):
                tp = self.postings(c.term)
                if tp is not None and tp.df:
                    parts.append(tp.local_idx(base))
            else:
                m = self.match(c)
                if m.size:
                    parts.append((m - base).astype(np.int64))
        if len(parts) < max(k, 1):
            # fewer non-empty children than min_match: no doc can appear
            # k times (parts are sorted-unique doc sets)
            return EMPTY_U64
        if len(parts) == 1:  # k <= 1 here
            return parts[0].astype(np.uint64) + base
        return self._union_count_vals(np.concatenate(parts), k)

    def _union_count_vals(self, allv: np.ndarray, k: int) -> np.ndarray:
        """The kernel of :meth:`_union_count` over segment-LOCAL int64 ids:
        dense bincount when the span is comparable to the hit volume,
        sort/unique otherwise (merged segments span huge id spaces)."""
        base = np.uint64(self.doc_base)
        span = self.doc_count
        if 0 < span <= min(4 * allv.size, 1 << 23):  # cap the per-query
            # dense allocation (a merged segment's span is the id space)
            cnt = np.bincount(allv, minlength=span)
            hits = np.flatnonzero(cnt >= k)
            return hits.astype(np.uint64) + base
        if k == 1:
            return np.unique(allv).astype(np.uint64) + base
        vals, counts = np.unique(allv, return_counts=True)
        return vals[counts >= k].astype(np.uint64) + base

    def _match_and(self, node: And) -> np.ndarray:
        """Cost-ordered intersection (reorder_execnodes, exec.cpp:27-131):
        cheapest side first; Token sides with large df are probed through the
        skiplist (``TermPostings.member``) instead of fully decoded — the
        leapfrog ``advance(target)`` of ConjuctionAllPLI."""
        positives = [c for c in node.children
                     if not isinstance(c, (Not, Optional_))]
        negatives = [c.child for c in node.children if isinstance(c, Not)]
        if positives:
            token_tps: list[TermPostings] = []
            other_sets: list[np.ndarray] = []
            for c in positives:
                if isinstance(c, Token):
                    tp = self.postings(c.term)
                    if tp is None:
                        return EMPTY_U64
                    token_tps.append(tp)
                else:
                    s = self.match(c)
                    if s.size == 0:
                        return EMPTY_U64
                    other_sets.append(s)
            token_tps.sort(key=lambda tp: tp.df)
            other_sets.sort(key=len)
            if other_sets and (not token_tps or
                               len(other_sets[0]) <= token_tps[0].df):
                cur = other_sets[0]
                other_sets = other_sets[1:]
            else:
                cur = token_tps[0].doc_ids
                token_tps = token_tps[1:]
            for s in other_sets:
                if cur.size == 0:
                    return EMPTY_U64
                cur = _intersect(cur, s)
            for tp in token_tps:
                if cur.size == 0:
                    return EMPTY_U64
                cur = cur[tp.member(cur)]
        else:
            cur = self.universe()
        for c in negatives:
            if cur.size == 0:
                break
            cur = _setdiff(cur, self.match(c))  # FilteredDocsSetSpan analogue
        return cur

    def _match_phrase(self, terms: tuple[str, ...]) -> np.ndarray:
        tps = []
        for t in terms:
            tp = self.postings(t)
            if tp is None:
                return EMPTY_U64
            tps.append(tp)
        # candidates: intersection, rarest-first, skiplist probes for the rest
        order = np.argsort([tp.df for tp in tps], kind="stable")
        cand = tps[order[0]].doc_ids
        for i in order[1:]:
            if cand.size == 0:
                return EMPTY_U64
            cand = cand[tps[i].member(cand)]
        if cand.size == 0:
            return EMPTY_U64
        # positional verification: occurrence keys rank*2^15 + pos; the chain
        # survives if pos+i exists for term i (DocWordsSpace check,
        # docwordspace.h:66-139)
        survivors = None
        for i, tp in enumerate(tps):
            pos_flat, lens = tp.gather_positions(cand)
            keys = (np.repeat(np.arange(cand.size, dtype=np.uint64), lens)
                    << np.uint64(_POS_SHIFT)) + pos_flat
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

    def _match_near(self, terms: tuple[str, ...], window: int) -> np.ndarray:
        """Unordered proximity: docs where ALL terms occur with position
        span (max - min over one chosen occurrence each) <= ``window``.

        A qualifying minimal window's left edge is itself some term's
        occurrence, so it suffices to test every occurrence key ``a`` (of
        any term) as anchor: the doc matches iff for EVERY term j there is
        an occurrence in [a, a + window].  Keys pack (cand_rank <<
        _POS_SHIFT) | pos — pos < 2^14 and window <= 2^14 keep a + window
        inside the rank's key block, so the searchsorted interval probes
        never bleed across docs.  Vectorized: k sorted-membership passes
        over the flat anchor array, no per-doc loop (the batch equivalent
        of a docset_spans.h window drive loop)."""
        from trinity_ray.tokenizer import MAX_POSITION

        if window < 0 or window >= MAX_POSITION:
            raise ValueError(f"near window must be in [0, {MAX_POSITION})")
        tps = []
        for t in dict.fromkeys(terms):
            tp = self.postings(t)
            if tp is None:
                return EMPTY_U64
            tps.append(tp)
        order = np.argsort([tp.df for tp in tps], kind="stable")
        cand = tps[order[0]].doc_ids
        for i in order[1:]:
            if cand.size == 0:
                return EMPTY_U64
            cand = cand[tps[i].member(cand)]
        if cand.size == 0:
            return EMPTY_U64
        keysets = []
        for tp in tps:
            pos_flat, lens = tp.gather_positions(cand)
            keysets.append(
                (np.repeat(np.arange(cand.size, dtype=np.uint64), lens)
                 << np.uint64(_POS_SHIFT)) + pos_flat)
        anchors = np.unique(np.concatenate(keysets))
        ok = np.ones(anchors.size, dtype=bool)
        w = np.uint64(window)
        for ks in keysets:
            # exists key in [a, a+window] for this term
            lo = np.searchsorted(ks, anchors, side="left")
            hi = np.searchsorted(ks, anchors + w, side="right")
            ok &= hi > lo
        ranks = np.unique(anchors[ok] >> np.uint64(_POS_SHIFT))
        return cand[ranks.astype(np.int64)]

    # -- scoring -------------------------------------------------------------
    def score(self, matched: np.ndarray, weights: dict[str, float],
              scorer: str | Scorer = "bm25") -> np.ndarray:
        """Sum of per-term contributions over the matched set (default:
        BM25 with norm stubbed to k1, similarity.h:228-235)."""
        sc = get_scorer(scorer) if isinstance(scorer, str) else scorer
        span = self.doc_count
        if 0 < span <= min(4 * matched.size, 1 << 23):
            # dense scatter: one O(df) fancy-assignment per term instead of
            # a searchsorted probe per (term, candidate) — wins when the
            # matched set is a sizable fraction of the segment span (hot
            # unions).  Per-doc addition order equals the sparse path
            # (same term iteration), so scores are bit-identical.
            dense = np.zeros(span, dtype=np.float64)
            base = np.uint64(self.doc_base)
            touched = False
            for term, w in weights.items():
                tp = self.postings(term)
                if tp is None or w == 0.0:
                    continue
                dense[tp.local_idx(base)] += tp.contrib(sc, w)
                touched = True
            if not touched:
                return np.zeros(matched.size, dtype=np.float64)
            return dense[(matched - base).astype(np.int64)]
        scores = np.zeros(matched.size, dtype=np.float64)
        for term, w in weights.items():
            tp = self.postings(term)
            if tp is None or w == 0.0:
                continue
            tf, found = tp.gather_tfs(matched)
            scores[found] += sc.contrib(w, tf[found])
        return scores

    def execute_subtrees(self, node: Node, weights: dict[str, float],
                         k: int, scorer: str | Scorer = "bm25",
                         allowed: np.ndarray | None = None,
                         ) -> tuple[np.ndarray, np.ndarray]:
        """Accumulated-score OR-of-subtrees
        (DocsSetSpanForDisjunctionsWithSpansAndCost, docset_spans.cpp:304-434):
        each top-level OR branch is matched as a unit and contributes its
        OWN terms' scores only on docs that match THAT branch — so a doc
        matching the phrase branch of '"key order" OR dup' is scored by
        key+order, not by incidental loose occurrences of a non-matching
        branch's terms.  Equals ``execute`` when every branch is a single
        token.  The matched set is identical to ``match(node)``."""
        from trinity_ray.query.ast import collect_scorable_terms

        sc = get_scorer(scorer) if isinstance(scorer, str) else scorer
        branches = (list(node.children) if isinstance(node, Or) else [node])
        acc_docs = EMPTY_U64
        acc_scores = EMPTY_F64
        for child in branches:
            m = self.match(child)
            if allowed is not None and m.size:
                m = _intersect(m, allowed)
            if self.mask is not None and m.size:
                m = _setdiff(m, self.mask)
            if m.size == 0:
                continue
            cw = {t: weights[t] for t in collect_scorable_terms(child)
                  if t in weights}
            s = self.score(m, cw, sc)
            if acc_docs.size == 0:
                acc_docs, acc_scores = m, s
            else:
                alld = np.concatenate((acc_docs, m))
                alls = np.concatenate((acc_scores, s))
                acc_docs, inv = np.unique(alld, return_inverse=True)
                acc_scores = np.bincount(inv, weights=alls)
        if acc_docs.size == 0:
            return EMPTY_U64, EMPTY_F64
        return _topk(acc_docs, acc_scores, k)

    def sequence_lengths(self, cand: np.ndarray,
                         seq_terms: list[str] | list[tuple[str, ...]]
                         ) -> np.ndarray:
        """Longest contiguous matched query-token run per candidate doc —
        the in-engine matched-SEQUENCE geometry of assign_query_indices /
        toNextSpan (queries.cpp:1048-1249), computed where positions are
        already decoded (the same selective block gathers phrase
        verification uses) instead of via a driver-side rich-hit gather.

        ``seq_terms[j]`` = the term at ORIGINAL query index j, or a tuple
        of ALTERNATIVE terms sharing that index (rewrite-spliced synonyms
        inherit their source gram's index — the rewrite_ctx provenance /
        translationCoefficient of queries_rewrite.h:312-492 reduced to
        positional index sharing).  A run [j, j+L) counts for a doc when
        SOME alternative of index j+i occurs at position p+i for every i.
        Fully vectorized: per-index occurrence keys
        (cand_rank << 15 | position) chained with sorted-membership probes
        — n_indices^2/2 numpy passes over flat key arrays, never a per-doc
        Python loop.  Returns int64 lengths (0 = no seq term present)."""
        groups = [(g,) if isinstance(g, str) else tuple(g)
                  for g in seq_terms]
        n = len(groups)
        best = np.zeros(cand.size, dtype=np.int64)
        if cand.size == 0 or n == 0:
            return best
        term_keys: list[np.ndarray | None] = []
        for grp in groups:
            parts: list[np.ndarray] = []
            for t in grp:
                tp = self.postings(t)
                if tp is None:
                    continue
                tf, found = tp.gather_tfs(cand)
                if not found.any():
                    continue
                np.maximum(best, 1, out=best, where=found)  # presence => L>=1
                if not tp.blob.has_positions:
                    continue
                sub = cand[found]
                pos_flat, lens = tp.gather_positions(sub)
                fidx = np.flatnonzero(found).astype(np.uint64)
                parts.append((np.repeat(fidx, lens)
                              << np.uint64(_POS_SHIFT)) + pos_flat)
            if not parts:
                term_keys.append(None)
            elif len(parts) == 1:
                term_keys.append(parts[0] if parts[0].size else None)
            else:  # alternatives' keys merged sorted-unique per index
                keys = np.unique(np.concatenate(parts))
                term_keys.append(keys if keys.size else None)
        one = np.uint64(1)
        shift = np.uint64(_POS_SHIFT)
        for j in range(n - 1):
            chain = term_keys[j]
            if chain is None:
                continue
            L = 1
            while j + L < n and chain is not None and chain.size:
                nxt = term_keys[j + L]
                if nxt is None:
                    break
                chain = chain[_member(chain + one, nxt)] + one
                if chain.size == 0:
                    break
                L += 1
                docs = np.unique(chain >> shift).astype(np.int64)
                np.maximum.at(best, docs, L)
        return best

    def execute_sequence(self, node: Node, weights: dict[str, float],
                         seq_terms: list[str], k: int,
                         scorer: str | Scorer = "bm25", bonus: float = 0.5,
                         allowed: np.ndarray | None = None,
                         ) -> tuple[np.ndarray, np.ndarray]:
        """Match + mask + score + matched-sequence bonus + local top-k:
        score(d) = base(d) + bonus * (longest_matched_sequence(d) - 1).

        The reference scores sequences DURING span execution
        (queries.cpp:1048-1249); this is the batch equivalent — the bonus
        is computed per segment for EVERY matching doc, so the global
        merge is exact at any k (no rerank pool).  Exhaustive scoring
        (no max-score pruning: the bonus can lift any doc by up to
        bonus*(n-1), which would invalidate the pruning bound)."""
        sc = get_scorer(scorer) if isinstance(scorer, str) else scorer
        matched = self.match(node)
        if allowed is not None and matched.size:
            matched = _intersect(matched, allowed)
        if self.mask is not None and matched.size:
            matched = _setdiff(matched, self.mask)
        if matched.size == 0:
            return EMPTY_U64, EMPTY_F64
        scores = self.score(matched, weights, sc)
        lengths = self.sequence_lengths(matched, seq_terms)
        # lengths==0 means the doc matched via a branch that carries no
        # indexed sequence term (e.g. a MatchSome alternative); clamp so
        # such docs score base+0 instead of base-bonus — a run of one and
        # no run at all contribute the same zero bonus
        scores = scores + bonus * (np.maximum(lengths, 1) - 1).astype(
            np.float64)
        return _topk(matched, scores, k)

    def execute(self, node: Node, weights: dict[str, float], k: int,
                scorer: str | Scorer = "bm25",
                allowed: np.ndarray | None = None,
                ) -> tuple[np.ndarray, np.ndarray]:
        """Match + mask + score + local top-k; returns (doc_ids, scores).

        ``allowed`` (sorted global doc_ids) is the app-side pre-filter seam
        (IndexDocumentsFilter, matches.h:188-201 / VectorIDs app docsets,
        docset_iterators.h:415-452): matching is restricted to the set but
        collection stats (df/N) are untouched — exactly like delete masks.

        Scored flat disjunctions take the max-score/WAND-pruned path; its
        output is identical to the exhaustive path (canonical re-score)."""
        sc = get_scorer(scorer) if isinstance(scorer, str) else scorer
        flat = _flat_or_terms(node) if k else None
        if flat is not None and weights and set(weights) <= set(flat):
            # pruning bounds cover exactly the query terms; a weights map
            # with EXTRA terms (public-API callers) must take the exhaustive
            # path or the bound math would under-estimate final scores
            return self._execute_maxscore(flat, weights, k, sc, allowed)
        matched = self.match(node)
        if allowed is not None and matched.size:
            matched = _intersect(matched, allowed)
        if self.mask is not None and matched.size:
            matched = _setdiff(matched, self.mask)
        if matched.size == 0:
            return EMPTY_U64, EMPTY_F64
        scores = self.score(matched, weights, sc)
        return _topk(matched, scores, k)

    def _execute_maxscore(self, terms: list[str], weights: dict[str, float],
                          k: int, sc: Scorer,
                          allowed: np.ndarray | None = None,
                          ) -> tuple[np.ndarray, np.ndarray]:
        """TAAT max-score over a flat term bag (Turtle & Flood max_score;
        the batch analogue of block-max WAND): process terms in descending
        score-bound order; once the tail bound sum cannot lift a NEW doc past
        the kth accumulated score, stop admitting docs and only refine
        survivors through skiplist block gathers.  Exactness: candidates are
        pruned only when their bound-augmented score provably misses the
        top-k (with _PRUNE_EPS slack), and survivors are re-scored through
        the canonical ``score()`` so float addition order matches the
        exhaustive path bit-for-bit."""
        tps: list[tuple[TermPostings, float]] = []
        for t in dict.fromkeys(terms):
            tp = self.postings(t)
            w = weights.get(t, 0.0)
            if tp is not None and w != 0.0:
                tps.append((tp, w))
        if not tps:
            return EMPTY_U64, EMPTY_F64
        ubs = np.array([sc.bound(w, float(tp.max_tf)) for tp, w in tps])
        order = np.argsort(-ubs, kind="stable")
        tps = [tps[i] for i in order]
        ubs = ubs[order]
        suffix = np.zeros(len(tps) + 1)
        suffix[:-1] = np.cumsum(ubs[::-1])[::-1]  # suffix[i] = sum(ubs[i:])

        acc_docs = EMPTY_U64
        acc_scores = EMPTY_F64
        closed = False
        for i, (tp, w) in enumerate(tps):
            if closed:
                if acc_docs.size == 0:
                    break
                tf, found = tp.gather_tfs(acc_docs)
                contrib = np.asarray(sc.contrib(w, tf), dtype=np.float64)
                contrib[~found] = 0.0
                acc_scores = acc_scores + contrib
            else:
                d = tp.doc_ids
                f = tp.freqs
                if allowed is not None and d.size:
                    keep = _member(d, allowed)
                    d, f = d[keep], f[keep]
                if self.mask is not None and d.size:
                    keep = ~_member(d, self.mask)
                    d, f = d[keep], f[keep]
                c = sc.contrib(w, f.astype(np.float64))
                if acc_docs.size == 0:
                    acc_docs, acc_scores = d, c.astype(np.float64)
                else:
                    alld = np.concatenate((acc_docs, d))
                    alls = np.concatenate((acc_scores, c))
                    acc_docs, inv = np.unique(alld, return_inverse=True)
                    acc_scores = np.bincount(inv, weights=alls)
            rem = suffix[i + 1]
            if acc_docs.size >= k:
                theta = np.partition(acc_scores, acc_docs.size - k)[acc_docs.size - k]
                if not closed and rem < theta - _PRUNE_EPS:
                    closed = True
                if closed:
                    keep = acc_scores + rem >= theta - _PRUNE_EPS
                    acc_docs = acc_docs[keep]
                    acc_scores = acc_scores[keep]
        if acc_docs.size == 0:
            return EMPTY_U64, EMPTY_F64
        scores = self.score(acc_docs, weights, sc)  # canonical float order
        return _topk(acc_docs, scores, k)


def _flat_or_terms(node: Node) -> list[str] | None:
    """Terms of a scored flat disjunction (Token or OR of Tokens), else None."""
    if isinstance(node, Token):
        return [node.term]
    if isinstance(node, Or) and all(isinstance(c, Token) for c in node.children):
        return [c.term for c in node.children]
    return None


def _topk(matched: np.ndarray, scores: np.ndarray, k: int,
          ) -> tuple[np.ndarray, np.ndarray]:
    """Top-k with exact (score desc, doc_id asc) tie-break across the cutoff."""
    if k and matched.size > k:
        # O(n) partial selection, then widen to include every doc tied with
        # the k-th score so the tie-break stays exact across the cutoff
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
