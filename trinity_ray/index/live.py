"""Near-real-time (NRT) in-memory index source.

The reference's ``IndexSource`` is an abstract seam (index_source.h:11-13):
an index source need not be a persisted segment — a RAM-resident structure
can serve queries the moment documents arrive, with durability deferred to
a later segment build.  Round 1 had only durable sources (freshness =
rebuild or incremental generation); this module closes that gap:

- :class:`MemorySegmentReader` — a :class:`SegmentReader` over blobs held
  in RAM (same codec, same execution paths: boolean algebra, WAND,
  phrases, rich hits), so every query feature works on fresh docs with
  zero code divergence.
- :class:`LiveIndex` — a generational RAM buffer: ``add_documents`` /
  ``delete_documents`` are visible to the next ``searcher()`` call;
  ``flush`` persists the buffer as a new generation of a durable index via
  the ordinary build path and clears the buffer.

Scale shape: one LiveIndex instance per ingest worker/actor over ITS shard
of the stream (the same partition-ownership model as the builder); search
fans out across workers exactly like RaySearcher over segments.  The RAM
buffer is bounded by flush cadence, not corpus size.
"""

from __future__ import annotations

import os
from types import SimpleNamespace
from typing import Iterable

import numpy as np
import pyarrow as pa

from trinity_ray.query.exec import EMPTY_U64, SegmentReader
from trinity_ray.search import LocalSearcher


class MemorySegmentReader(SegmentReader):
    """SegmentReader whose dictionary and blobs live in RAM.

    Accepts the encoder's terms table (term, df, max_tf, sum_hits, blob)
    and answers every SegmentReader API (probe, postings, match, execute,
    rich_hits, doc_ids_where) without touching disk.
    """

    def __init__(self, terms_table: pa.Table, doc_base: int, doc_count: int,
                 mask: np.ndarray | None = None,
                 docs_table: pa.Table | None = None):
        # deliberately does NOT call super().__init__ (that path opens and
        # format-checks segment files)
        self.seg_path = "<memory>"
        self.doc_base = int(doc_base)
        self.doc_count = int(doc_count)
        self.mask = mask if mask is not None and len(mask) else None
        self._files = [("<memory>", "<memory>")]
        buf = bytearray()
        # in-memory blobs stay FULL (hits inline, hoff/hlen = 0): the
        # PostingsBlob full-blob path never calls the hits loader
        d: dict[str, tuple[int, int, int, int, int, int, int]] = {}
        for term, df, mtf, blob in zip(
                terms_table.column("term").to_pylist(),
                terms_table.column("df").to_pylist(),
                terms_table.column("max_tf").to_pylist(),
                terms_table.column("blob").to_pylist()):
            d[term] = (int(df), int(mtf), 0, len(buf), len(blob), 0, 0)
            buf += blob
        self._dict = d
        self._buf = bytes(buf)
        self._rg_index = None
        self._rg_cache = {}
        self._handles = {}
        self._universe = None
        self._cache = {}
        self._sorted_terms = None
        self._docs_tbl = docs_table

    def _ensure_dict(self) -> None:  # dictionary is always resident
        return

    def _read_blob(self, fi: int, off: int, ln: int) -> bytes:
        return self._buf[off:off + ln]

    def doc_ids_where(self, predicate) -> np.ndarray:
        if self._docs_tbl is None:
            return EMPTY_U64
        from trinity_ray.query.exec import DocPredicate

        t = self._docs_tbl
        if isinstance(predicate, DocPredicate):
            # shared evaluation path: fn sees the same pruned column shape
            # on a RAM segment as on a durable one
            return predicate.ids(t)
        mask = np.asarray(predicate(t), dtype=bool)
        ids = t.column("doc_id").to_numpy().astype(np.uint64)
        return np.sort(ids[mask])

    def doc_values(self, ids, column: str):
        from trinity_ray.query.exec import _member

        if self._docs_tbl is None:
            return pa.chunked_array([[]], type=pa.null())
        t = self._docs_tbl
        if column not in t.column_names:
            raise KeyError(f"docs metadata has no column {column!r} "
                           f"(has {t.column_names})")
        d = t.column("doc_id").to_numpy().astype(np.uint64)
        return t.column(column).filter(pa.array(_member(d, ids)))

    def close(self) -> None:
        return


class LiveIndex:
    """RAM-resident NRT buffer over (optionally) a durable base index.

    ``add_documents`` assigns docIDs above every durable generation;
    ``delete_documents`` masks both live and durable docs at query time
    (stats untouched, exactly like delete segments).  ``searcher()``
    returns a LocalSearcher-compatible object over durable + live docs
    with GLOBAL df (never partial idf).  ``flush`` makes the buffer
    durable as a new generation and empties it.
    """

    def __init__(self, base_dir: str | None = None, *,
                 tokenizer: str = "simple", positions: bool = True,
                 codec: str = "varint"):
        self.base_dir = base_dir
        self.tokenizer = tokenizer
        self.positions = positions
        self.codec = codec
        self._base: LocalSearcher | None = None
        if base_dir is not None:
            self._base = LocalSearcher(base_dir)
            if self._base.manifest.tokenizer != tokenizer or \
                    self._base.manifest.positions != positions:
                raise ValueError(
                    "LiveIndex tokenizer/positions must match the base index")
            self._next = max((s.doc_end for s in self._base.manifest.segments),
                             default=0)
            self._base_gen = max(
                (s.generation for s in self._base.manifest.segments),
                default=0)
        else:
            self._next = 0
            self._base_gen = -1
        # the durable base's app-field schema (docs columns minus the core
        # document columns) — new generations must keep it
        self._base_fields: frozenset[str] | None = None
        if self._base is not None:
            import pyarrow.dataset as pads

            # UNION across all docs-bearing segments: a degenerate
            # empty-partition segment writes a doc_id-only docs file and
            # must not mask the app fields the real segments carry
            fields: set[str] = set()
            seen_docs = False
            for r in self._base.readers:
                src = r._docs_source()
                if src is None:
                    continue
                seen_docs = True
                fields |= set(pads.dataset(src, format="parquet"
                                           ).schema.names)
            if seen_docs:
                self._base_fields = frozenset(
                    fields - {"doc_id", "content_sha256", "doc_len"})
        self._live_base = self._next
        self._texts: list[str] = []          # live docs, id = _live_base + i
        self._meta: dict[str, list] = {}     # app fields, aligned to _texts
        self._deleted: set[int] = set()      # live-time deletes (any id)
        self._frozen = None                  # cached (reader, version)
        self._version = 0

    # -- mutations -----------------------------------------------------------
    def add_documents(self, texts: Iterable[str],
                      metadata: dict[str, Iterable] | None = None
                      ) -> np.ndarray:
        """Buffer documents; optional ``metadata`` maps app-field column ->
        per-doc values (the IndexDocumentsFilter / facet app fields,
        matches.h:188-201).  The first metadata-carrying call fixes the
        column set for the buffer's lifetime; every later call must supply
        exactly those columns (mixed schemas would make doc_ids_where /
        facet answers depend on which call a doc arrived in)."""
        texts = list(texts)
        meta = {k: list(v) for k, v in (metadata or {}).items()}
        reserved = {"text", "doc_id", "content_sha256", "doc_len"}
        bad = reserved & set(meta)
        if bad:
            raise ValueError(
                f"metadata column(s) {sorted(bad)} collide with core "
                f"document columns")
        for k, v in meta.items():
            if len(v) != len(texts):
                raise ValueError(
                    f"metadata column {k!r} has {len(v)} values for "
                    f"{len(texts)} docs")
        if self._texts or self._meta:
            if set(meta) != set(self._meta):
                raise ValueError(
                    f"metadata columns {sorted(meta)} != buffer's "
                    f"{sorted(self._meta)}")
        elif self._base_fields is not None and \
                set(meta) != self._base_fields:
            # a durable base fixes the app-field schema: a generation
            # flushed with different columns would make facet/predicate
            # answers depend on which generation a doc landed in
            raise ValueError(
                f"metadata columns {sorted(meta)} != base index app "
                f"fields {sorted(self._base_fields)}")
        start = self._next
        self._texts.extend(t or "" for t in texts)
        for k, v in meta.items():
            self._meta.setdefault(k, []).extend(v)
        self._next += len(texts)
        self._version += 1
        return np.arange(start, self._next, dtype=np.uint64)

    def delete_documents(self, doc_ids: Iterable[int]) -> None:
        self._deleted.update(int(d) for d in doc_ids)
        self._version += 1

    # -- search --------------------------------------------------------------
    def _memory_reader(self) -> MemorySegmentReader | None:
        if not self._texts:
            return None
        if self._frozen is not None and self._frozen[1] == self._version:
            return self._frozen[0]
        from trinity_ray.index.build import SegmentBuilder
        from trinity_ray.tokenizer import MAX_POSITION

        enc = SegmentBuilder(
            index_dir="<memory>", content_column="text", id_columns=(),
            tokenizer=self.tokenizer, positions=self.positions,
            generation=self._base_gen + 1, codec=self.codec)
        vocab: dict[str, int] = {}
        term_ids: list[int] = []
        doc_ids: list[np.ndarray] = []
        pos_parts: list[np.ndarray] = []
        for i, text in enumerate(self._texts):
            toks = enc.tokenize(text)[: MAX_POSITION - 1]
            term_ids.extend(vocab.setdefault(t, len(vocab)) for t in toks)
            d = np.full(len(toks), self._live_base + i, dtype=np.uint64)
            doc_ids.append(d)
            if self.positions:
                pos_parts.append(np.arange(1, len(toks) + 1, dtype=np.uint64))
        hit_docs = (np.concatenate(doc_ids) if doc_ids
                    else np.empty(0, np.uint64))
        hit_pos = (np.concatenate(pos_parts)
                   if self.positions and pos_parts else None)
        _stats, (table,) = enc._encode_segment(
            vocab, np.asarray(term_ids, dtype=np.int64), hit_docs, hit_pos)
        docs_tbl = pa.table({
            "doc_id": pa.array(
                np.arange(self._live_base, self._next, dtype=np.uint64),
                pa.uint64()),
            **{k: pa.array(v) for k, v in self._meta.items()},
        })
        reader = MemorySegmentReader(
            table, self._live_base, len(self._texts), docs_table=docs_tbl)
        self._frozen = (reader, self._version)
        return reader

    def searcher(self) -> LocalSearcher:
        """LocalSearcher-compatible view over durable + live docs, with
        live deletes masked everywhere and global df."""
        dele = (np.sort(np.fromiter(self._deleted, dtype=np.uint64))
                if self._deleted else None)
        readers = []
        n_docs = 0
        if self._base is not None:
            n_docs += int(self._base.n_docs)
            for r in self._base.readers:
                sub = None
                if dele is not None:
                    lo = np.searchsorted(dele, r.doc_base)
                    hi = np.searchsorted(dele, r.doc_base + r.doc_count)
                    sub = dele[lo:hi]
                if sub is not None and sub.size:
                    m = (np.union1d(r.mask, sub) if r.mask is not None
                         else sub)
                    clone = SegmentReader(r.seg_path, r.doc_base,
                                          r.doc_count, mask=m)
                    readers.append(clone)
                else:
                    readers.append(r)
        mem = self._memory_reader()
        if mem is not None:
            n_docs += len(self._texts)
            if dele is not None:
                lo = np.searchsorted(dele, mem.doc_base)
                hi = np.searchsorted(dele, mem.doc_base + mem.doc_count)
                mem.mask = dele[lo:hi] if hi > lo else None
            readers.append(mem)
        s = LocalSearcher.__new__(LocalSearcher)
        s.index_dir = self.base_dir
        s.manifest = SimpleNamespace(tokenizer=self.tokenizer)
        s.n_docs = float(n_docs)
        s.readers = readers
        return s

    # -- durability ----------------------------------------------------------
    def flush(self, index_dir: str | None = None):
        """Persist the live buffer as a new generation of ``index_dir``
        (default: the base index) through the ordinary durable build path,
        then clear the buffer.  Returns the new manifest (None if the
        buffer was empty)."""
        import tempfile

        import pyarrow.parquet as pq

        from trinity_ray.index.build import build_index
        from trinity_ray.index.merge import delete_docs

        target = index_dir or self.base_dir
        if target is None:
            raise ValueError("flush needs an index_dir (no base index)")
        if self.base_dir is not None and \
                os.path.realpath(target) != os.path.realpath(self.base_dir):
            # buffered docIDs and deletes live in the BASE index's id
            # space; building into another index would rebase the docs but
            # apply deletes (and previously handed-out ids) unrebased
            raise ValueError(
                "flush target must be the base index "
                f"({self.base_dir!r}); got {target!r}")
        if self.base_dir is None and os.path.exists(
                os.path.join(target, "manifest.json")):
            raise ValueError(
                "flush of a baseless LiveIndex needs a FRESH directory: "
                f"{target!r} already holds an index whose id space the "
                "buffer does not extend")
        manifest = None
        if self._texts:
            with tempfile.TemporaryDirectory() as td:
                p = os.path.join(td, "live.parquet")
                pq.write_table(pa.table({
                    "text": pa.array(self._texts),
                    **{k: pa.array(v) for k, v in self._meta.items()},
                }), p)
                manifest = build_index(
                    p, target, content_column="text",
                    id_columns=tuple(sorted(self._meta)),
                    tokenizer=self.tokenizer, positions=self.positions,
                    generation=self._base_gen + 1, codec=self.codec)
        if self._deleted:
            delete_docs(target, sorted(self._deleted),
                        generation=self._base_gen + 2)
        # buffer is durable now: reset on top of the new state
        self.__init__(target, tokenizer=self.tokenizer,
                      positions=self.positions, codec=self.codec)
        return manifest
