"""Segment merge (compaction): the index's one all-to-all shuffle.

The reference merges segments with a serial k-way merge over sorted term
dictionaries (/root/reference/merge.cpp:40-416): per term it either
byte-copies a single source's chunk (append_index_chunk, merge.cpp:166-180),
codec-merges multiple sources lowest-docID-first, or decode→filter→re-encodes
when delete masks apply, with masked-doc registries built only from NEWER
sources (merge.cpp:27-35) and fresh field_statistics accumulated.

Ray-Data-first re-expression (SURVEY.md §3.2)::

    per input segment: read postings.parquet, tag (generation, doc_base)
      → union → groupby("term")                 # THE shuffle
      → map_groups(merge_term): apply newer-generation delete masks,
          ordered-concat postings by doc_base (partitions own disjoint
          ascending docID ranges ⇒ merge is a concat, never an interleave),
          re-encode one blob
      → write term-sharded postings parquet (each output block is a
        key-range from the sort-based shuffle ⇒ per-file row-group
        statistics still prune dictionary probes)

Skew note: a merge group holds at most one row per input segment —
group fan-in is bounded by the segment count, not by df, so hot terms
('DEF', 'RETURN') cost bytes, not cardinality; no salting is needed for
the groupby itself (salting matters for df-keyed aggregations, which the
ops layer does — see trinity_ray.ops).

Delete/replace semantics (reference §2.9, index_source.h:199-216): a doc
deleted by ANY newer generation is dropped from older segments' postings;
after a full merge all deletes are physically applied and statistics are
recomputed from live docs, so post-merge scores equal a from-scratch
rebuild over the live corpus (verified in tests/test_merge.py).
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from trinity_ray.codec import PostingsBlob, encode_postings
from trinity_ray.index.segment import (
    DELETES_FILE,
    DOCS_FILE,
    POSTINGS_FILE,
    STATS_FILE,
    TERMS_ROW_GROUP,
    FieldStatistics,
    IndexManifest,
    SegmentMeta,
    read_manifest,
    segment_dir,
    write_manifest,
)
from trinity_ray.rayutil import package_runtime_env


def compute_masks(manifest: IndexManifest, index_dir: str) -> dict[str, np.ndarray]:
    """name -> sorted deleted doc_ids (from strictly newer generations)."""
    from trinity_ray.search import _segment_masks

    return _segment_masks(manifest, index_dir)


class _MergeTermGroup:
    """map_groups fn: rows of one term from many segments -> one merged row."""

    __name__ = "merge_term_group"  # map_groups wraps plain functions

    def __init__(self, masks: dict[str, np.ndarray], positions: bool):
        self.masks = masks
        self.positions = positions

    def __call__(self, group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group.column("seg_name").to_pylist(),
                group.column("doc_base").to_pylist(),
                group.column("blob").to_pylist(),
            ),
            key=lambda r: r[1],
        )
        term = group.column("term")[0].as_py()
        doc_parts, freq_parts, pos_parts = [], [], []
        for seg_name, _base, blob in rows:
            pb = PostingsBlob(blob)
            d, f = pb.decode_docs_freqs()
            if self.positions:
                p, offs = pb.decode_positions(f)
            mask = self.masks.get(seg_name)
            if mask is not None and mask.size:
                idx = np.searchsorted(mask, d)
                idx_c = np.minimum(idx, mask.size - 1)
                keep = mask[idx_c] != d
                if not keep.all():
                    if self.positions:
                        keep_hits = np.repeat(keep, f.astype(np.int64))
                        p = p[keep_hits]
                    d, f = d[keep], f[keep]
            if d.size:
                doc_parts.append(d)
                freq_parts.append(f)
                if self.positions:
                    pos_parts.append(p)
        if not doc_parts:
            return pa.table({
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.uint32()),
                "max_tf": pa.array([], pa.uint32()),
                "sum_hits": pa.array([], pa.uint64()),
                "blob": pa.array([], pa.binary()),
            })
        doc_ids = np.concatenate(doc_parts)
        freqs = np.concatenate(freq_parts)
        positions = np.concatenate(pos_parts) if self.positions else None
        blob = encode_postings(doc_ids, freqs, positions)
        return pa.table({
            "term": pa.array([term], pa.string()),
            "df": pa.array([doc_ids.size], pa.uint32()),
            "max_tf": pa.array([int(min(freqs.max(), 0xFFFFFFFF))], pa.uint32()),
            "sum_hits": pa.array([int(freqs.sum())], pa.uint64()),
            "blob": pa.array([blob], pa.binary()),
        })


def merge_index(
    index_dir: str,
    out_dir: str,
    *,
    concurrency: int | None = None,
) -> IndexManifest:
    """Compact all segments of ``index_dir`` into one logical segment in
    ``out_dir`` (term-sharded postings files), applying all deletes.
    Ray must already be initialised by the caller."""
    import ray
    import ray.data as rd

    manifest = read_manifest(index_dir)
    masks = compute_masks(manifest, index_dir)
    positions = manifest.positions

    gen = max((s.generation for s in manifest.segments), default=0)
    name = f"g{gen:06d}-merged"
    out_seg = segment_dir(out_dir, name)
    os.makedirs(out_seg, exist_ok=True)

    # --- postings: union of tagged per-segment datasets → groupby(term) ---
    parts = []
    for s in manifest.segments:
        ppath = os.path.join(segment_dir(index_dir, s.name), POSTINGS_FILE)
        if not os.path.exists(ppath):
            continue
        d = rd.read_parquet(ppath, columns=["term", "blob"])
        seg_name, doc_base = s.name, s.doc_base

        def tag(t: pa.Table, seg_name=seg_name, doc_base=doc_base) -> pa.Table:
            return t.append_column(
                "seg_name", pa.array([seg_name] * len(t), pa.string())
            ).append_column(
                "doc_base", pa.array([doc_base] * len(t), pa.uint64())
            )

        parts.append(d.map_batches(tag, batch_format="pyarrow"))
    if not parts:
        raise ValueError(f"no postings in {index_dir}")
    ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    merged = ds.groupby("term").map_groups(
        _MergeTermGroup(masks, positions),
        batch_format="pyarrow",
        runtime_env=package_runtime_env(),
    )
    postings_dir = os.path.join(out_seg, "postings")
    merged.write_parquet(
        postings_dir, row_group_size=TERMS_ROW_GROUP, compression="zstd",
        min_rows_per_file=200_000,
    )
    # one term-range file per shuffle output block; SegmentReader opens the
    # directory as a pyarrow dataset (row-group statistics still prune).

    # --- docs: stream live doc metadata (never materialized on the driver:
    # at 10^12 docs this is the big table; deletes broadcast once) ---------
    all_deleted = (
        np.unique(np.concatenate(list(masks.values()))) if masks else np.empty(0, np.uint64)
    )
    doc_paths = [
        p for s in manifest.segments
        if os.path.exists(p := os.path.join(segment_dir(index_dir, s.name), DOCS_FILE))
    ]
    ds_docs = rd.read_parquet(doc_paths)
    if all_deleted.size:
        deleted_ref = ray.put(all_deleted)

        def drop_deleted(batch: pa.Table) -> pa.Table:
            dele = ray.get(deleted_ref)
            ids = batch.column("doc_id").to_numpy().astype(np.uint64)
            idx = np.minimum(np.searchsorted(dele, ids), dele.size - 1)
            return batch.filter(pa.array(dele[idx] != ids))

        ds_docs = ds_docs.map_batches(drop_deleted, batch_format="pyarrow",
                                      runtime_env=package_runtime_env())
    docs_dir = os.path.join(out_seg, "docs")
    ds_docs.write_parquet(docs_dir, compression="zstd")
    docs_cnt = sum(
        pq.read_metadata(os.path.join(docs_dir, f)).num_rows
        for f in os.listdir(docs_dir) if f.endswith(".parquet")
    )

    # --- stats: recompute from merged postings (cheap column reads) -------
    stat_files = [
        os.path.join(postings_dir, f) for f in os.listdir(postings_dir)
        if f.endswith(".parquet")
    ]
    total_terms = 0
    sum_terms_docs = 0
    sum_term_hits = 0
    for f in stat_files:
        t = pq.read_table(f, columns=["df", "sum_hits"])
        total_terms += len(t)
        sum_terms_docs += int(pa.compute.sum(t.column("df")).as_py() or 0)
        sum_term_hits += int(pa.compute.sum(t.column("sum_hits")).as_py() or 0)
    stats = FieldStatistics(
        docs_cnt=docs_cnt,
        sum_term_hits=sum_term_hits,
        total_terms=total_terms,
        sum_terms_docs=sum_terms_docs,
    )
    with open(os.path.join(out_seg, STATS_FILE), "w") as f:
        json.dump({**stats.__dict__, "generation": gen, "doc_base": 0,
                   "doc_count": docs_cnt}, f)

    doc_end = max((s.doc_end for s in manifest.segments), default=0)
    out_manifest = IndexManifest(
        version=manifest.version + 1,
        tokenizer=manifest.tokenizer,
        positions=positions,
        segments=[SegmentMeta(
            name=name, generation=gen, part_id=0,
            doc_base=0, doc_count=doc_end,  # id-space span; universe comes
            stats=stats,                     # from docs.parquet (holes OK)
        )],
        content_column=manifest.content_column,
        id_columns=manifest.id_columns,
    )
    write_manifest(out_dir, out_manifest)
    return out_manifest


def delete_docs(index_dir: str, doc_ids: Iterable[int], generation: int) -> None:
    """Append a deletes-only segment: newest generation masks older ones
    (SegmentIndexSession::erase semantics, indexer.h:181-206 — last-writer-
    wins dedup keyed on docID, SURVEY.md §2.9)."""
    manifest = read_manifest(index_dir)
    ids = np.unique(np.fromiter((int(d) for d in doc_ids), dtype=np.uint64))
    name = f"g{generation:06d}-deletes"
    seg = segment_dir(index_dir, name)
    os.makedirs(seg, exist_ok=True)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.uint64())}),
                   os.path.join(seg, DELETES_FILE))
    stats = FieldStatistics()
    with open(os.path.join(seg, STATS_FILE), "w") as f:
        json.dump({**stats.__dict__, "generation": generation,
                   "doc_base": 0, "doc_count": 0}, f)
    manifest.segments.append(SegmentMeta(
        name=name, generation=generation, part_id=-1,
        doc_base=0, doc_count=0, stats=stats, has_deletes=True,
    ))
    manifest.version += 1
    write_manifest(index_dir, manifest)
