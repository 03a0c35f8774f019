"""Ray-Data index build: Parquet corpus → per-partition posting-list segments.

Pipeline shape (the reference's SegmentIndexSession commit pipeline,
/root/reference/indexer.cpp:311-564, re-expressed Ray-Data-first per
SURVEY.md §3.1)::

    plan_partitions(parquet metadata)            # driver, deterministic
      → ray.data.from_items(partition specs)
      → map_batches(SegmentBuilder, concurrency=N, batch_size=1)
      → per-partition segment dirs + stats rows
    write_manifest                               # driver

Key design points for 100 TB scale:

- **Deterministic docIDs independent of parallelism** (SURVEY.md §7.4): the
  driver plans partitions from Parquet file/row-group metadata only — each
  partition is a contiguous run of row groups of one file, and owns the
  contiguous docID range ``[doc_base, doc_base + rows)`` derived from the
  global cumulative row count in (sorted-path, row-group) order.  Any
  parallelism produces byte-identical segments.
- **No shuffle.** Tokenize + sort + encode are partition-local (the
  reference sorts 32 sub-partitions in one process; we sort one partition
  per task).  The only wide op in the system is segment *merge*
  (trinity_ray.index.merge).
- **Checkpoint/resume** (north_rule): a partition whose segment directory is
  already complete (stats.json present) is skipped — its stats are read
  back; reruns after failure only build missing partitions.  Segment dirs
  are written atomically (tmp + rename, like indexer.cpp:284-299).
- **Streaming within a partition:** the builder reads its row groups
  batch-by-batch via pyarrow (only the content + id columns — prune at the
  read), tokenizes, and accumulates compact numpy arrays (term ids via a
  per-partition dict), then does ONE lexsort + vectorized encode_many at
  the end — the analogue of the reference's scan/sort/encode trio
  (indexer.cpp:337-478) with the 11.8 s PFOR encode phase replaced by
  global numpy varint passes.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass
from typing import Any, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from trinity_ray.codec import (
    PostingsBlob,
    _range_idx,
    encode_many_arrow,
    encode_postings,
    index_part_len,
    index_part_lens,
)
from trinity_ray.rayutil import package_runtime_env
from trinity_ray.index.segment import (
    BIN_FILE,
    DOCS_FILE,
    SEGMENT_FORMAT,
    STATS_FILE,
    TERMS_FILE,
    TERMS_ROW_GROUP,
    FieldStatistics,
    IndexManifest,
    SegmentMeta,
    read_segment_stats,
    segment_dir,
    segment_is_complete,
    write_manifest,
)
from trinity_ray.tokenizer import (MAX_POSITION, arrow_ascii_view,
                                   batch_token_stream,
                                   batch_token_stream_buffer, get_tokenizer)


@dataclass
class PartitionSpec:
    part_id: int
    path: str
    row_groups: list[int]
    doc_base: int
    rows: int

    def to_row(self) -> dict:
        return {
            "part_id": self.part_id,
            "path": self.path,
            "row_groups": json.dumps(self.row_groups),
            "doc_base": self.doc_base,
            "rows": self.rows,
        }


def _list_parquet_files(paths: str | Iterable[str]) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(".parquet"))
        return [paths]
    return sorted(paths)


def default_target_rows(total_rows: int) -> int:
    """Adaptive default partition size for ``build_index``.

    Targets ~128 partitions (several waves on any realistic worker count),
    clamped below so tiny corpora don't fragment into per-row segments and
    above so huge corpora keep the proven ~250k cap.  Derived from the
    CORPUS ONLY (never cluster size): a resumed build must re-plan
    identically on any cluster, or every checkpointed segment would fail
    the lineage check and rebuild."""
    return int(min(250_000, max(1024, total_rows // 128 + 1)))


def plan_partitions(
    paths: str | Iterable[str],
    target_rows: int = 250_000,
    metadata: list | None = None,
) -> list[PartitionSpec]:
    """Deterministic partition plan from Parquet metadata (driver-side).

    Partitions never span files (so a partition reads one file's row groups)
    and are built greedily from consecutive row groups up to ``target_rows``.
    docID bases are global cumulative row counts in (sorted path, row group)
    order — the per-partition contiguous docID range invariant the codecs
    and the merge's ordered-concat depend on (SURVEY.md §4 ordering row).
    ``metadata`` optionally supplies pre-read ``pq.read_metadata`` objects
    (position-matched to the sorted file list) so callers that already
    paid the footer reads don't pay them twice.
    """
    files = _list_parquet_files(paths)
    specs: list[PartitionSpec] = []
    doc_base = 0
    part_id = 0
    for fi, path in enumerate(files):
        meta = metadata[fi] if metadata is not None else pq.read_metadata(path)
        cur_rgs: list[int] = []
        cur_rows = 0
        for rg in range(meta.num_row_groups):
            nrows = meta.row_group(rg).num_rows
            if cur_rows and cur_rows + nrows > target_rows:
                specs.append(PartitionSpec(part_id, path, cur_rgs, doc_base, cur_rows))
                part_id += 1
                doc_base += cur_rows
                cur_rgs, cur_rows = [], 0
            cur_rgs.append(rg)
            cur_rows += nrows
        if cur_rgs:
            specs.append(PartitionSpec(part_id, path, cur_rgs, doc_base, cur_rows))
            part_id += 1
            doc_base += cur_rows
    return specs


def segment_name(generation: int, part_id: int) -> str:
    return f"g{generation:06d}-p{part_id:05d}"


class TermsBinWriter:
    """Write a (terms.parquet, postings.bin, postings.hits) triple: the
    term dictionary rows (term, df, max_tf, sum_hits, off, len, hoff,
    hlen), the concatenated blob INDEX PARTS (header + directory + docs +
    freqs), and the concatenated positions+payloads byte ranges.  The
    dictionary answers probes with zero postings IO (term_index_ctx
    analogue, codecs.h:17-55); blob reads are exact byte ranges, and
    docs-only/BM25 queries never touch the hits file (the reference's
    separate hits.data channel, lucene_codec.cpp:107-137)."""

    SCHEMA = pa.schema([
        ("term", pa.string()), ("df", pa.uint32()), ("max_tf", pa.uint32()),
        ("sum_hits", pa.uint64()), ("off", pa.uint64()), ("len", pa.uint32()),
        ("hoff", pa.uint64()), ("hlen", pa.uint32()),
    ])

    def __init__(self, terms_path: str, bin_path: str):
        from trinity_ray.index.segment import hits_path

        self._writer = pq.ParquetWriter(terms_path, self.SCHEMA,
                                        compression="zstd")
        self._bin = open(bin_path, "wb")
        self._hits = open(hits_path(bin_path), "wb")
        self._off = 0
        self._hoff = 0
        self._rows: list[tuple] = []

    def add(self, term: str, df: int, max_tf: int, sum_hits: int,
            blob: bytes) -> None:
        split = index_part_len(blob)
        self._bin.write(blob[:split])
        self._hits.write(blob[split:])
        hlen = len(blob) - split
        self._rows.append((term, df, max_tf, sum_hits,
                           self._off, split, self._hoff, hlen))
        self._off += split
        self._hoff += hlen
        if len(self._rows) >= TERMS_ROW_GROUP:
            self._flush()

    def add_table(self, table: pa.Table) -> None:
        """Vectorized bulk add of an encoder output table (term, df,
        max_tf, sum_hits, blob): one numpy pass parses every blob's header
        for its index/hits split point, two range-gathers emit the bin and
        hits streams, and the dictionary rows are written as Arrow columns
        — no per-term Python loop over postings bytes."""
        n = table.num_rows
        if n == 0:
            return
        self._flush()                     # keep earlier add() rows ordered
        blob = table.column("blob").combine_chunks()
        bufs = blob.buffers()
        data = (np.frombuffer(bufs[2], np.uint8)
                if bufs[2] is not None else np.empty(0, np.uint8))
        # encode_many_arrow switches to large_binary (int64 offsets) once a
        # run's blob bytes exceed 2 GiB — parse the offsets buffer at the
        # matching width or every start/end is garbage
        off_dt = (np.int64 if pa.types.is_large_binary(blob.type)
                  else np.int32)
        boffs = np.frombuffer(bufs[1], off_dt)[
            blob.offset:blob.offset + n + 1].astype(np.int64)
        starts, ends = boffs[:-1], boffs[1:]
        split = index_part_lens(data, starts, ends)
        ilens = split
        hlens = (ends - starts) - split
        self._bin.write(data[_range_idx(starts, ilens)].tobytes())
        self._hits.write(data[_range_idx(starts + split, hlens)].tobytes())
        offs = self._off + np.concatenate(([0], np.cumsum(ilens)))
        hoffs = self._hoff + np.concatenate(([0], np.cumsum(hlens)))
        self._writer.write_table(pa.table({
            "term": table.column("term").cast(pa.string()),
            "df": table.column("df").cast(pa.uint32()),
            "max_tf": table.column("max_tf").cast(pa.uint32()),
            "sum_hits": table.column("sum_hits").cast(pa.uint64()),
            "off": pa.array(offs[:-1].astype(np.uint64), pa.uint64()),
            "len": pa.array(ilens.astype(np.uint32), pa.uint32()),
            "hoff": pa.array(hoffs[:-1].astype(np.uint64), pa.uint64()),
            "hlen": pa.array(hlens.astype(np.uint32), pa.uint32()),
        }, schema=self.SCHEMA), row_group_size=TERMS_ROW_GROUP)
        self._off = int(offs[-1])
        self._hoff = int(hoffs[-1])

    def _flush(self) -> None:
        if self._rows:
            self._writer.write_table(pa.table({
                "term": pa.array([r[0] for r in self._rows], pa.string()),
                "df": pa.array([r[1] for r in self._rows], pa.uint32()),
                "max_tf": pa.array([r[2] for r in self._rows], pa.uint32()),
                "sum_hits": pa.array([r[3] for r in self._rows], pa.uint64()),
                "off": pa.array([r[4] for r in self._rows], pa.uint64()),
                "len": pa.array([r[5] for r in self._rows], pa.uint32()),
                "hoff": pa.array([r[6] for r in self._rows], pa.uint64()),
                "hlen": pa.array([r[7] for r in self._rows], pa.uint32()),
            }, schema=self.SCHEMA))
            self._rows = []

    def close(self) -> None:
        self._flush()
        self._writer.close()
        self._bin.close()
        self._hits.close()


class _RunStream:
    """Buffered (term, blob) cursor over one flush-run parquet file."""

    __slots__ = ("_batches", "_tbl", "_i", "term", "blob")

    def __init__(self, path: str):
        self._batches = pq.ParquetFile(path).iter_batches(
            batch_size=1024, columns=["term", "blob"])
        self._tbl = None
        self._i = 0
        self.term: str | None = None
        self.blob: bytes | None = None
        self.advance()

    def advance(self) -> None:
        if self._tbl is None or self._i >= self._tbl.num_rows:
            try:
                self._tbl = next(self._batches)
            except StopIteration:
                self.term = None
                self.blob = None
                return
            self._i = 0
        self.term = self._tbl.column("term")[self._i].as_py()
        self.blob = self._tbl.column("blob")[self._i].as_py()
        self._i += 1


class SegmentBuilder:
    """Stateful actor stage: one partition spec in → one segment dir + stats row.

    The analogue of SegmentIndexSession (indexer.h:76-94): per-actor state
    (tokenizer, config) initialised once; per-partition accumulation lives
    inside one __call__.
    """

    def __init__(
        self,
        index_dir: str,
        content_column: str,
        id_columns: tuple[str, ...],
        tokenizer: str,
        positions: bool,
        generation: int,
        # ~2k docs per tokenize chunk keeps each task's working set inside
        # its LLC share at full parallelism: on the 1.5M-doc corpus, 12k-row
        # partitions built at 20.6k docs/s with 8192-row read batches and
        # 93.5k docs/s with 2048 (32 CPUs) — identical output either way
        read_batch_rows: int = 2048,
        flush_hits: int = 4_000_000,
        replace_docs: bool = False,
        codec: str = "varint",
        payloads: str | None = None,
    ):
        self.index_dir = index_dir
        self.content_column = content_column
        self.id_columns = tuple(id_columns)
        self.tokenizer_name = tokenizer
        self.tokenize = get_tokenizer(tokenizer)
        self.positions = positions
        self.generation = generation
        self.read_batch_rows = read_batch_rows
        # replace semantics (SegmentIndexSession::replace, indexer.h:181-206):
        # this generation's docIDs mask the same IDs in OLDER generations —
        # each segment writes its own id range as its deletes list, and the
        # existing newer-generation masking machinery does the rest
        self.replace_docs = replace_docs
        # bounded working set: hits are sorted+encoded into an intermediate
        # RUN once this many accumulate (the reference spills doc records at
        # intermediateStateFlushFreq, indexer.cpp:134-152); runs merge
        # term-streaming at the end, so a partition of ANY size builds in
        # O(flush_hits) memory
        self.flush_hits = flush_hits
        # codec seam (codecs.h:67-317): blobs are self-describing, so the
        # codec is a per-segment WRITE choice; readers dispatch per blob
        self.codec = codec
        # per-hit payload channel (codecs.h:194-195): payloads="char_offset"
        # stores each hit's character offset (u32) via the span tokenizer
        self.payload_kind = payloads
        if payloads is not None:
            if payloads != "char_offset":
                raise ValueError(f"unknown payload kind {payloads!r}")
            from trinity_ray.tokenizer import get_tokenizer_spans

            self.tokenize_spans = get_tokenizer_spans(tokenizer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            out_rows.append(self._build_one(row))
        return pa.Table.from_pylist(out_rows)

    # -- one partition → one segment ----------------------------------------
    def _build_one(self, spec: dict) -> dict:
        name = segment_name(self.generation, spec["part_id"])
        if segment_is_complete(self.index_dir, name):  # checkpoint/resume
            st = read_segment_stats(self.index_dir, name)
            lin = st.get("lineage", {})
            if (st.get("doc_base") != spec["doc_base"]
                    or st.get("doc_count") != spec["rows"]
                    or lin.get("input_path") != spec["path"]
                    or lin.get("row_groups") != json.loads(spec["row_groups"])):
                # same name, DIFFERENT partition plan (target size or input
                # changed): the checkpoint encodes docIDs from another
                # doc_base — resuming it would corrupt the id space
                import shutil

                shutil.rmtree(segment_dir(self.index_dir, name))
            else:
                return {"name": name, "resumed": True, **{k: st[k] for k in
                    ("docs_cnt", "sum_term_hits", "total_terms", "sum_terms_docs")},
                        "part_id": spec["part_id"], "doc_base": spec["doc_base"],
                        "doc_count": spec["rows"], "generation": self.generation,
                        "tokenize_s": 0.0, "encode_s": 0.0, "persist_s": 0.0}

        t_start = time.perf_counter()
        row_groups = json.loads(spec["row_groups"])
        pf = pq.ParquetFile(spec["path"])
        columns = [self.content_column, *self.id_columns]

        final_dir = segment_dir(self.index_dir, name)
        tmp_dir = f"{final_dir}.tmp-{os.getpid()}"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)

        # vocabulary dict: term -> dense local id (SegmentIndexSession's
        # term<->id dicts, indexer.h:90-91); persists across flush runs
        vocab: dict[str, int] = {}
        term_ids_parts: list[np.ndarray] = []
        doc_ids_parts: list[np.ndarray] = []
        pos_parts: list[np.ndarray] = []
        pending_hits = 0
        pay_parts: list[np.ndarray] = []
        run_files: list[str] = []
        run_stats: list[FieldStatistics] = []
        docs_writer: pq.ParquetWriter | None = None
        encode_s = 0.0
        t_enc_total = [0.0]

        def flush_run() -> None:
            nonlocal term_ids_parts, doc_ids_parts, pos_parts, pay_parts, \
                pending_hits
            if pending_hits == 0 and run_files:
                return
            t0 = time.perf_counter()
            term_ids = (np.concatenate(term_ids_parts) if term_ids_parts
                        else np.empty(0, np.int32))
            hit_docs = (np.concatenate(doc_ids_parts) if doc_ids_parts
                        else np.empty(0, np.uint32))
            hit_pos = (np.concatenate(pos_parts) if pos_parts
                       else None)
            hit_pay = (np.concatenate(pay_parts) if pay_parts
                       else None)
            term_ids_parts, doc_ids_parts, pos_parts, pay_parts = [], [], [], []
            pending_hits = 0
            st, (table,) = self._encode_segment(vocab, term_ids, hit_docs,
                                                hit_pos, hit_pay,
                                                doc_base=dbase)
            run_stats.append(st)
            path = os.path.join(tmp_dir, f"run-{len(run_files):04d}.parquet")
            pq.write_table(table, path, row_group_size=TERMS_ROW_GROUP,
                           compression="zstd")
            run_files.append(path)
            t_enc_total[0] += time.perf_counter() - t0

        next_doc = spec["doc_base"]
        dbase = spec["doc_base"]
        for rb in pf.iter_batches(batch_size=self.read_batch_rows,
                                  row_groups=row_groups, columns=columns):
            content_col = rb.column(self.content_column)
            texts = None  # materialized lazily: only fallback paths need it
            n = len(content_col)
            batch_docs = np.arange(next_doc, next_doc + n, dtype=np.uint64)
            # hit streams carry PARTITION-LOCAL uint32 doc offsets (and
            # int32/uint32 term ids + positions): the sort/gather in
            # _encode_segment is memory-bandwidth-bound at 32-way, and
            # halving every hit-level array halves that traffic.  Absolute
            # uint64 docIDs are restored at the POSTINGS level (doc_base
            # re-added before the codec), so blob bytes are unchanged.
            batch_local = np.arange(next_doc - dbase, next_doc - dbase + n,
                                    dtype=np.uint32)
            if self.payload_kind is None:
                # hot path: flat RAW byte-token stream (regex scan only),
                # one Arrow dictionary_encode over the batch, and Python
                # normalization + vocab probes per DISTINCT token only
                # (~1000x fewer Python ops than per-token classification
                # — the tokenize->encode memory-traffic hot spot).
                # All-ASCII null-free batches scan the Arrow values buffer
                # zero-copy (no per-doc Python strings at all); others
                # fall back to the list path.
                view = arrow_ascii_view(content_col)
                if view is not None:
                    idx, norm, counts_raw = batch_token_stream_buffer(
                        view[0], view[1], view[2], self.tokenizer_name)
                else:
                    texts = content_col.to_pylist()
                    idx, norm, counts_raw = batch_token_stream(
                        texts, self.tokenizer_name)
                v = vocab
                # dropped terms (MAX_TERM_LEN) map to -1; zero-hit vocab
                # entries are tolerated by _encode_segment (same as terms
                # seen only beyond the position cap)
                mapping = np.fromiter(
                    (v.setdefault(t, len(v)) if t is not None else -1
                     for t in norm),
                    dtype=np.int32, count=len(norm))
                tids_all = (mapping[idx] if idx.size
                            else np.empty(0, np.int32))
                keep = tids_all >= 0
                # 1-based position among KEPT tokens, restarting per doc
                # (dropped tokens do not consume a position — parity with
                # the per-doc tokenizer, which never emits them).  int32
                # when the batch's RAW token count fits (always, short of
                # a >2^31-token read batch — but guard it, don't assume)
                cdt = np.int32 if idx.size < (1 << 31) else np.int64
                ck = np.cumsum(keep, dtype=cdt)
                z1 = np.zeros(1, cdt)
                starts = np.concatenate(([0], np.cumsum(counts_raw)))
                ck_ext = np.concatenate((z1, ck))
                before = ck_ext[starts[:-1]]
                kept_per_doc = np.diff(ck_ext[starts])
                pos_all = ck - np.repeat(before, counts_raw)
                keep &= pos_all < MAX_POSITION  # cap: pos <= MAX_POSITION-1
                counts = np.minimum(kept_per_doc, MAX_POSITION - 1)
                term_ids_parts.append(tids_all[keep])
                # per doc exactly `counts` tokens survive `keep`, so repeat
                # by the final counts directly — no raw-length uint64 array
                # + mask gather on the hot path
                doc_ids_parts.append(np.repeat(batch_local, counts))
                if self.positions:
                    pos_parts.append(pos_all[keep].astype(np.uint32))
                pending_hits += int(counts.sum())
            else:
                texts = content_col.to_pylist()
                pairs = [self.tokenize_spans(t or "") for t in texts]
                tok_lists = [p[0] for p in pairs]
                span_lists = [p[1] for p in pairs]
                counts = np.fromiter(
                    (min(len(l), MAX_POSITION - 1) for l in tok_lists),
                    dtype=np.int64, count=n)
                import itertools as _it

                flat_toks = list(_it.chain.from_iterable(
                    toks if len(toks) <= MAX_POSITION - 1
                    else toks[: MAX_POSITION - 1]
                    for toks in tok_lists))
                de = pa.array(flat_toks, pa.large_string()).dictionary_encode()
                bdict = de.dictionary.to_pylist()
                v = vocab
                mapping = np.fromiter((v.setdefault(t, len(v)) for t in bdict),
                                      dtype=np.int32, count=len(bdict))
                idx = de.indices.to_numpy(zero_copy_only=False)
                term_ids_parts.append(mapping[idx] if idx.size
                                      else np.empty(0, np.int32))
                doc_ids_parts.append(np.repeat(batch_local, counts))
                if self.positions:
                    # positions restart at 1 per doc
                    pos = np.arange(1, int(counts.sum()) + 1, dtype=np.uint32)
                    cum = np.concatenate(([0], np.cumsum(counts)))
                    pos -= np.repeat(cum[:-1], counts).astype(np.uint32)
                    pos_parts.append(pos)
                flat_sp: list[int] = []
                for sp, c in zip(span_lists, counts):
                    flat_sp.extend(sp[: int(c)])
                pay_parts.append(
                    np.minimum(np.asarray(flat_sp, dtype=np.uint64),
                               np.uint64(0xFFFFFFFF)).astype(np.uint32))
                pending_hits += int(counts.sum())

            if texts is None:
                # buffer path: hash the original UTF-8 bytes straight from
                # the Arrow values buffer (identical to (t or "").encode())
                vals, offs, _up = view
                mv = memoryview(vals)
                sha = pa.array(
                    [hashlib.sha256(mv[offs[i]:offs[i + 1]]).hexdigest()
                     for i in range(n)])
            else:
                sha = pa.array(
                    [hashlib.sha256((t or "").encode()).hexdigest()
                     for t in texts]
                )
            meta_cols = {"doc_id": pa.array(batch_docs, type=pa.uint64())}
            for c in self.id_columns:
                meta_cols[c] = rb.column(c)
            meta_cols["content_sha256"] = sha
            meta_cols["doc_len"] = pa.array(counts, type=pa.uint32())
            meta = pa.table(meta_cols)
            if docs_writer is None:  # doc metadata streams straight to disk
                docs_writer = pq.ParquetWriter(
                    os.path.join(tmp_dir, DOCS_FILE), meta.schema,
                    compression="zstd")
            docs_writer.write_table(meta)
            next_doc += n

            if pending_hits >= self.flush_hits:
                flush_run()  # a doc's hits never split across runs

        doc_count = next_doc - spec["doc_base"]
        assert doc_count == spec["rows"], (doc_count, spec)
        if docs_writer is None:
            docs_writer = pq.ParquetWriter(
                os.path.join(tmp_dir, DOCS_FILE),
                pa.schema([("doc_id", pa.uint64())]), compression="zstd")
        docs_writer.close()
        t_tokenized = time.perf_counter()

        if self.replace_docs:
            pq.write_table(
                pa.table({"doc_id": pa.array(
                    np.arange(spec["doc_base"], next_doc, dtype=np.uint64),
                    pa.uint64())}),
                os.path.join(tmp_dir, "deletes.parquet"))

        t0 = time.perf_counter()
        if not run_files:
            # single-run fast path (the common case: a partition whose
            # hits fit one flush): encode in memory and bulk-write straight
            # to (terms.parquet, postings.bin/.hits) — every postings byte
            # otherwise pays a zstd compress + write + read + decompress
            # round trip through the run parquet
            term_ids = (np.concatenate(term_ids_parts) if term_ids_parts
                        else np.empty(0, np.int32))
            hit_docs = (np.concatenate(doc_ids_parts) if doc_ids_parts
                        else np.empty(0, np.uint32))
            hit_pos = np.concatenate(pos_parts) if pos_parts else None
            hit_pay = np.concatenate(pay_parts) if pay_parts else None
            stats, (table,) = self._encode_segment(vocab, term_ids,
                                                   hit_docs, hit_pos,
                                                   hit_pay,
                                                   doc_base=dbase)
            out = TermsBinWriter(os.path.join(tmp_dir, TERMS_FILE),
                                 os.path.join(tmp_dir, BIN_FILE))
            out.add_table(table)
            out.close()
        else:
            flush_run()
            stats = self._finalize_runs(tmp_dir, run_files, run_stats)
        stats.docs_cnt = doc_count
        # N for BM25 = ALL documents in the partition, including token-less
        # ones (our definition, mirrored by the oracle): deterministic and
        # independent of tokenizer edge cases.
        t_enc_total[0] += time.perf_counter() - t0
        encode_s = t_enc_total[0]

        with open(os.path.join(tmp_dir, STATS_FILE), "w") as f:
            json.dump({"format": SEGMENT_FORMAT,
                       "codec": self.codec,
                       "payloads": self.payload_kind,
                       "docs_cnt": stats.docs_cnt,
                       "sum_term_hits": stats.sum_term_hits,
                       "total_terms": stats.total_terms,
                       "sum_terms_docs": stats.sum_terms_docs,
                       "doc_base": spec["doc_base"],
                       "doc_count": doc_count,
                       "generation": self.generation,
                       "flush_runs": max(1, len(run_files)),
                       # per-partition lineage: exactly which input bytes
                       # produced this segment (resume/audit; north_rule)
                       "lineage": {"input_path": spec["path"],
                                   "row_groups": row_groups},
                       # phase timings — the reference profiles the same
                       # trio (collect/sort+encode/persist,
                       # indexer.cpp:303-306)
                       "timings_s": {
                           "tokenize": round(t_tokenized - t_start, 4),
                           "encode": round(encode_s, 4),
                       }}, f)
        if os.path.exists(final_dir):
            import shutil

            if segment_is_complete(self.index_dir, name):
                shutil.rmtree(tmp_dir)  # lost a race to a VALID build: it wins
            else:
                # stale leftover (old format / partial dir): replace it —
                # keeping it would silently discard this rebuild and leave
                # an unreadable segment behind a fresh manifest
                shutil.rmtree(final_dir)
                os.replace(tmp_dir, final_dir)
        else:
            os.replace(tmp_dir, final_dir)
        t_done = time.perf_counter()
        return {"name": name, "resumed": False, "part_id": spec["part_id"],
                "doc_base": spec["doc_base"], "doc_count": doc_count,
                "generation": self.generation,
                "docs_cnt": stats.docs_cnt, "sum_term_hits": stats.sum_term_hits,
                "total_terms": stats.total_terms, "sum_terms_docs": stats.sum_terms_docs,
                "tokenize_s": round(t_tokenized - t_start, 4),
                "encode_s": round(encode_s, 4),
                "persist_s": round(max(0.0, t_done - t_tokenized - encode_s), 4)}

    def _finalize_runs(self, tmp_dir: str, run_files: list[str],
                       run_stats: list[FieldStatistics]) -> FieldStatistics:
        """Turn flush runs into the final (terms.parquet, postings.bin)
        dictionary/postings pair.

        Single run (the common case): stream the run's rows through the
        TermsBinWriter.  Multiple runs: streaming k-way merge by term —
        each run is term-sorted, runs own strictly ascending disjoint docID
        ranges, so a term's merged postings are the doc-order concatenation
        of its per-run postings (the same invariant segment merge uses,
        merge.cpp:256-287)."""
        out = TermsBinWriter(os.path.join(tmp_dir, TERMS_FILE),
                             os.path.join(tmp_dir, BIN_FILE))
        if len(run_files) == 1:
            pf = pq.ParquetFile(run_files[0])
            for rb in pf.iter_batches(batch_size=4096):
                out.add_table(pa.Table.from_batches([rb]))
            out.close()
            os.unlink(run_files[0])
            return run_stats[0]

        streams = [_RunStream(f) for f in run_files]
        total_terms = 0
        sum_terms_docs = 0
        sum_term_hits = 0
        while True:
            alive = [s for s in streams if s.term is not None]
            if not alive:
                break
            term = min(s.term for s in alive)
            doc_parts, freq_parts, pos_parts, pay_parts = [], [], [], []
            for s in streams:  # run order == ascending doc ranges
                if s.term == term:
                    pb = PostingsBlob(s.blob)
                    d, f = pb.decode_docs_freqs()
                    doc_parts.append(d)
                    freq_parts.append(f)
                    if self.positions:
                        pos_parts.append(pb.decode_positions(f)[0])
                    if self.payload_kind is not None:
                        pay_parts.append(pb.decode_payloads(f)[0])
                    s.advance()
            doc_ids = np.concatenate(doc_parts)
            freqs = np.concatenate(freq_parts)
            positions = np.concatenate(pos_parts) if self.positions else None
            payloads = (np.concatenate(pay_parts)
                        if self.payload_kind is not None else None)
            blob = encode_postings(doc_ids, freqs, positions,
                                   payloads=payloads,
                                   payload_width=4 if payloads is not None else 0,
                                   codec=self.codec)
            hits = int(freqs.sum())
            out.add(term, doc_ids.size, int(min(freqs.max(), 0xFFFFFFFF)),
                    hits, blob)
            total_terms += 1
            sum_terms_docs += doc_ids.size
            sum_term_hits += hits
        out.close()
        for f in run_files:
            os.unlink(f)
        return FieldStatistics(0, sum_term_hits, total_terms, sum_terms_docs)

    def _encode_segment(
        self,
        vocab: dict[str, int],
        term_ids: np.ndarray,
        hit_docs: np.ndarray,
        hit_pos: np.ndarray,
        hit_pay: np.ndarray | None = None,
        doc_base: int = 0,
    ) -> tuple[FieldStatistics, tuple[pa.Table, ...]]:
        """Sort hits by (term, doc, pos) and encode — indexer.cpp:396-478.

        ``hit_docs`` may be partition-LOCAL uint32 offsets with the
        absolute base supplied as ``doc_base`` (the build hot path: 32-bit
        hit streams halve the sort/gather memory traffic), or absolute
        uint64 ids with ``doc_base=0`` (LiveIndex).  Docs are widened to
        absolute uint64 at the postings level, so blob bytes are identical
        either way."""
        n_hits = term_ids.size
        if n_hits == 0:
            empty = pa.table({
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.uint32()),
                "max_tf": pa.array([], pa.uint32()),
                "sum_hits": pa.array([], pa.uint64()),
                "blob": pa.array([], pa.binary()),
            })
            return FieldStatistics(), (empty,)

        # terms must be encoded in lexicographic order (sorted dictionary,
        # terms.cpp:126-172): remap local ids to sorted-term order first
        terms_sorted = sorted(vocab, key=lambda t: t)
        rank = np.empty(len(vocab), dtype=term_ids.dtype)
        for r, t in enumerate(terms_sorted):
            rank[vocab[t]] = r
        term_ids = rank[term_ids]

        # hits arrive doc-ascending (batch scan order) with ascending
        # positions inside each doc, so a STABLE sort on the TERM key ALONE
        # reproduces lexsort((pos, doc, term)): equal-term runs keep their
        # original (doc, pos) order.  uint32 keys halve the radix-sort
        # memory traffic vs the r4 packed 64-bit (term, doc) key — encode
        # is memory-bandwidth-bound at high parallelism (the raw-scaling
        # lever VERDICT r4 #3 points at).  The invariant is checked in one
        # vectorized pass; unsorted callers fall back to the full lexsort.
        if n_hits < 2:
            stream_sorted = True
        else:
            adjacent_ok = hit_docs[1:] >= hit_docs[:-1]
            if hit_pos is not None:
                # positions must not DECREASE within a doc: a doc-sorted
                # but pos-unsorted stream would otherwise encode negative
                # position deltas that wrap as uint64 (silent corruption)
                adjacent_ok &= ((hit_docs[1:] > hit_docs[:-1])
                                | (hit_pos[1:] >= hit_pos[:-1]))
            stream_sorted = bool(adjacent_ok.all())
        if stream_sorted:
            if len(vocab) < (1 << 32) and n_hits < (1 << 32):
                # stable sort via ONE uint64 VALUE sort: (key << 32) | index
                # — ties break by original index, reproducing
                # argsort(kind="stable") exactly, but a value sort avoids
                # the indirect index moves that make numpy's stable argsort
                # ~6x slower (measured 200 ms -> 33 ms at 1.7M hits)
                comp = term_ids.astype(np.uint64) << np.uint64(32)
                comp |= np.arange(n_hits, dtype=np.uint64)
                comp.sort()
                comp &= np.uint64(0xFFFFFFFF)
                order = comp  # uint64 indices gather fine
            else:
                order = np.argsort(term_ids, kind="stable")
        else:
            order = (np.lexsort((hit_pos, hit_docs, term_ids))
                 if hit_pos is not None
                 else np.lexsort((hit_docs, term_ids)))
        term_ids = term_ids[order]
        hit_docs = hit_docs[order]
        if hit_pos is not None:
            hit_pos = hit_pos[order]
        if hit_pay is not None:
            hit_pay = hit_pay[order]

        # collapse hits → postings (term, doc, tf) with per-posting hit slices
        key_change = np.empty(n_hits, dtype=bool)
        key_change[0] = True
        np.not_equal(term_ids[1:], term_ids[:-1], out=key_change[1:])
        doc_change = np.empty(n_hits, dtype=bool)
        doc_change[0] = True
        np.not_equal(hit_docs[1:], hit_docs[:-1], out=doc_change[1:])
        posting_start = key_change | doc_change
        p_idx = np.flatnonzero(posting_start)
        p_term = term_ids[p_idx]
        # widen to absolute uint64 docIDs at the POSTINGS level (the codec
        # encodes first-doc absolute + deltas; bytes match the old
        # absolute-throughout path exactly)
        p_doc = hit_docs[p_idx].astype(np.uint64, copy=False)
        if doc_base:
            p_doc = p_doc + np.uint64(doc_base)
        p_tf = np.diff(np.concatenate((p_idx, [n_hits]))).astype(np.uint64)

        term_start_mask = np.empty(p_idx.size, dtype=bool)
        term_start_mask[0] = True
        np.not_equal(p_term[1:], p_term[:-1], out=term_start_mask[1:])
        term_offsets = np.concatenate(
            (np.flatnonzero(term_start_mask), [p_idx.size])
        ).astype(np.int64)

        blobs = encode_many_arrow(
            term_offsets, p_doc, p_tf,
            hit_pos if (self.positions and hit_pos is not None) else None,
            payloads=hit_pay,
            payload_width=4 if hit_pay is not None else 0,
            codec=self.codec)

        dfs = np.diff(term_offsets).astype(np.uint64)
        max_tf = np.maximum.reduceat(p_tf, term_offsets[:-1]).astype(np.uint64)
        sum_hits = np.add.reduceat(p_tf.astype(np.int64), term_offsets[:-1]).astype(np.uint64)
        # distinct terms present, in sorted order (vocab may contain terms
        # only seen beyond the position cap — use actual encoded terms)
        present_ranks = p_term[term_offsets[:-1]]
        term_arr = [terms_sorted[r] for r in present_ranks]

        stats = FieldStatistics(
            docs_cnt=int(np.unique(p_doc).size),
            sum_term_hits=int(n_hits),
            total_terms=int(len(term_arr)),
            sum_terms_docs=int(dfs.sum()),
        )
        table = pa.table({
            "term": pa.array(term_arr, pa.string()),
            "df": pa.array(dfs, pa.uint32()),
            "max_tf": pa.array(np.minimum(max_tf, 0xFFFFFFFF), pa.uint32()),
            "sum_hits": pa.array(sum_hits, pa.uint64()),
            "blob": blobs,  # zero-copy Arrow binary over ONE buffer
        })
        return stats, (table,)


def _build_partitions_task(batch: pa.Table, **kwargs: Any) -> pa.Table:
    return SegmentBuilder(**kwargs)(batch)


def build_index(
    input_paths: str | Iterable[str],
    index_dir: str,
    *,
    content_column: str = "content",
    id_columns: tuple[str, ...] = (),
    tokenizer: str = "trinity",
    positions: bool = True,
    generation: int = 0,
    target_rows_per_partition: int | None = None,
    concurrency: int | None = None,
    read_batch_rows: int = 2048,
    flush_hits: int = 4_000_000,
    replace_docs: bool = False,
    codec: str = "varint",
    payloads: str | None = None,
) -> IndexManifest:
    """Build (or resume) an index over a Parquet corpus.  Ray must already
    be initialised by the caller; this function never calls ray.init()."""
    import ray
    import ray.data as rd

    os.makedirs(os.path.join(index_dir, "segments"), exist_ok=True)
    manifest_path = os.path.join(index_dir, "manifest.json")
    prev = None
    if os.path.exists(manifest_path):
        from trinity_ray.index.segment import read_manifest

        prev = read_manifest(index_dir)
        if prev.tokenizer != tokenizer or prev.positions != positions:
            raise ValueError(
                f"index {index_dir} was built with tokenizer="
                f"{prev.tokenizer!r}/positions={prev.positions}; "
                f"rebuild into a fresh directory to change them")

    # materialize the file list ONCE: input_paths may be a one-shot
    # iterable, and the footers it names are read exactly once below
    files = _list_parquet_files(input_paths)
    metas = [pq.read_metadata(p) for p in files]
    if target_rows_per_partition is None:
        # adaptive default (small corpora previously collapsed to rows/250k
        # tasks — a 1.5M-doc default-args build ran 8-wide on 32 CPUs)
        target_rows_per_partition = default_target_rows(
            sum(m.num_rows for m in metas))
    specs = plan_partitions(files, target_rows=target_rows_per_partition,
                            metadata=metas)
    if not specs:
        raise ValueError(f"no parquet input found at {input_paths!r}")
    if prev is not None and not replace_docs:
        # APPEND into an existing index: new docs get fresh docIDs above every
        # prior generation's range (replace_docs=True intentionally REUSES the
        # old doc_base so its deletes.parquet masks the replaced rows —
        # last-writer-wins, index_source.h:199-216).  Without this offset a
        # plain append collides with older generations' docIDs.
        others = [s for s in prev.segments if s.generation != generation]
        base = max((s.doc_base + s.doc_count for s in others), default=0)
        if base:
            specs = [
                PartitionSpec(s.part_id, s.path, s.row_groups,
                              s.doc_base + base, s.rows)
                for s in specs
            ]

    if concurrency is None:
        concurrency = max(1, min(len(specs), int(ray.cluster_resources().get("CPU", 4))))

    ds = rd.from_items([s.to_row() for s in specs])
    builder_kwargs = dict(
        index_dir=index_dir,
        content_column=content_column,
        id_columns=id_columns,
        tokenizer=tokenizer,
        positions=positions,
        generation=generation,
        read_batch_rows=read_batch_rows,
        flush_hits=flush_hits,
        replace_docs=replace_docs,
        codec=codec,
        payloads=payloads,
    )
    # plain tasks, not an actor pool: SegmentBuilder holds only cheap config
    # (tokenizer regex, paths), so per-task reconstruction costs ~ms while
    # tasks reuse the warm default worker pool — an N-actor pool would pay
    # N process spawns + imports per build (the scaling-run killer)
    builder_results = ds.map_batches(
        _build_partitions_task,
        fn_kwargs=builder_kwargs,
        batch_size=1,           # one partition per task invocation
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
        runtime_env=package_runtime_env(),
    ).take_all()

    segments = [
        SegmentMeta(
            name=r["name"],
            generation=r["generation"],
            part_id=r["part_id"],
            doc_base=r["doc_base"],
            doc_count=r["doc_count"],
            has_deletes=replace_docs,
            stats=FieldStatistics(
                docs_cnt=r["docs_cnt"],
                sum_term_hits=r["sum_term_hits"],
                total_terms=r["total_terms"],
                sum_terms_docs=r["sum_terms_docs"],
            ),
        )
        for r in sorted(builder_results, key=lambda r: r["part_id"])
    ]
    version = 1
    if prev is not None:
        # incremental build: keep OTHER generations' segments (including
        # deletes) — delete_docs appends to the manifest, so build must too
        segments = [s for s in prev.segments
                    if s.generation != generation] + segments
        segments.sort(key=lambda s: (s.generation, s.part_id))
        version = prev.version + 1
    if replace_docs:
        # replace builds embed a delete list in each new segment; stamp the
        # manifest version it appears at so compaction tombstone GC can
        # tell already-applied lists from later ones (see SegmentMeta)
        for s in segments:
            if s.has_deletes and s.generation == generation:
                s.created_version = version
    manifest = IndexManifest(
        version=version,
        tokenizer=tokenizer,
        positions=positions,
        segments=segments,
        content_column=content_column,
        id_columns=tuple(id_columns),
    )
    write_manifest(index_dir, manifest)
    # per-partition metrics sidecar (lineage lives in each segment's
    # stats.json; this is the run-level roll-up for dashboards / audits)
    metrics = {
        "partitions": [
            {k: r.get(k) for k in ("name", "part_id", "resumed", "doc_count",
                                   "sum_term_hits", "total_terms",
                                   "tokenize_s", "encode_s", "persist_s")}
            for r in sorted(builder_results, key=lambda r: r["part_id"])
        ],
        "totals": {
            "docs": sum(r["doc_count"] for r in builder_results),
            "hits": sum(r["sum_term_hits"] for r in builder_results),
            "resumed_partitions": sum(1 for r in builder_results if r["resumed"]),
            "built_partitions": sum(1 for r in builder_results if not r["resumed"]),
        },
    }
    tmp = os.path.join(index_dir, "build_metrics.json.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "build_metrics.json"))
    return manifest
