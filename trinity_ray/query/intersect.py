"""Co-occurrence statistics over alternative terms — the analogue of the
reference's ``intersection_alternatives`` (/root/reference/intersect.cpp:5-327,
intersect.h:25-59): given K candidate tokens (e.g. rewrite alternatives),
count for every combination-bitmask how many documents contain exactly that
subset.  The reference merge-scans the K posting lists with dominance
pruning; we re-express it as vectorized mask accumulation per segment plus
a tiny cross-segment sum — docIDs are segment-disjoint, so per-segment
counts add without a shuffle.

Used to decide which rewrite alternatives actually co-occur before paying
for an expanded query (queries_rewrite.h's candidate-selection input).
"""

from __future__ import annotations

import numpy as np

from trinity_ray.search import LocalSearcher


def segment_mask_counts(reader, terms: list[str]) -> dict[int, int]:
    """mask -> doc count for one segment (mask bit i == terms[i] present)."""
    if len(terms) > 32:
        raise ValueError("at most 32 alternative terms")
    doc_parts: list[np.ndarray] = []
    w_parts: list[np.ndarray] = []
    for i, t in enumerate(terms):
        tp = reader.postings(t)
        if tp is None:
            continue
        d = tp.doc_ids
        if reader.mask is not None and d.size:
            keep_idx = np.searchsorted(reader.mask, d)
            keep_idx = np.minimum(keep_idx, reader.mask.size - 1)
            d = d[reader.mask[keep_idx] != d]
        doc_parts.append(d)
        w_parts.append(np.full(d.size, 1 << i, dtype=np.int64))
    if not doc_parts:
        return {}
    docs = np.concatenate(doc_parts)
    bits = np.concatenate(w_parts)
    # each term contributes its (distinct) bit at most once per doc, so the
    # per-doc OR equals the per-doc SUM -> one bincount pass
    _, inv = np.unique(docs, return_inverse=True)
    masks = np.bincount(inv, weights=bits.astype(np.float64)).astype(np.int64)
    vals, counts = np.unique(masks, return_counts=True)
    return {int(v): int(c) for v, c in zip(vals, counts)}


def intersection_counts(index_dir: str, terms: list[str]) -> dict[int, int]:
    """mask -> doc count across the whole index.  Segments own disjoint
    docID ranges (build invariant), so counts sum with no shuffle — the
    same per-source isolation the reference exploits (exec.h:57-62)."""
    searcher = LocalSearcher(index_dir)
    out: dict[int, int] = {}
    for r in searcher.readers:
        for m, c in segment_mask_counts(r, terms).items():
            out[m] = out.get(m, 0) + c
    return out


def intersection_counts_ray(index_dir: str, terms: list[str],
                            num_actors: int = 4) -> dict[int, int]:
    """Scatter-gather variant: per-segment mask counting in an actor pool
    (one task per segment shard), tiny dict merge on the driver."""
    import ray

    from trinity_ray.index.segment import read_manifest, segment_dir
    from trinity_ray.query.exec import SegmentReader
    from trinity_ray.rayutil import package_runtime_env
    from trinity_ray.search import _segment_masks

    manifest = read_manifest(index_dir)
    masks = _segment_masks(manifest, index_dir)

    @ray.remote(num_cpus=1, runtime_env=package_runtime_env())
    def shard_counts(segs: list[dict]) -> dict[int, int]:
        out: dict[int, int] = {}
        for s in segs:
            r = SegmentReader(segment_dir(index_dir, s["name"]), s["doc_base"],
                              s["doc_count"], mask=s["mask"])
            for m, c in segment_mask_counts(r, terms).items():
                out[m] = out.get(m, 0) + c
        return out

    segs = [{"name": s.name, "doc_base": s.doc_base, "doc_count": s.doc_count,
             "mask": masks.get(s.name)} for s in manifest.segments]
    num_actors = max(1, min(num_actors, len(segs)))
    shards = [segs[i::num_actors] for i in range(num_actors)]
    out: dict[int, int] = {}
    for part in ray.get([shard_counts.remote(sh) for sh in shards]):
        for m, c in part.items():
            out[m] = out.get(m, 0) + c
    return out
