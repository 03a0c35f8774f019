"""Dedup operators: exact (hash groupby), MinHash LSH, SimHash, n-gram
Jaccard verify, embedding LSH — SURVEY.md training-data ops, checked against
brute-force python on a deterministic corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from trinity_ray.ops.dedup import (
    _shingle_hashes,
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_pairs,
    verify_pairs_jaccard,
)
from trinity_ray.tokenizer import get_tokenizer

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight").split()


def corpus() -> list[str]:
    rng = np.random.default_rng(3)
    docs = []
    for i in range(60):
        words = [BASE[j % len(BASE)] for j in rng.permutation(40)]
        docs.append(" ".join(words))
    docs[10] = docs[3]                      # exact dup
    docs[20] = docs[5]                      # exact dup
    docs[30] = docs[7] + " extra token"     # near dup
    docs[40] = docs[7].replace("fox", "cat")  # near dup
    return docs


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    docs = corpus()
    return docs, rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))


def test_exact_dedup_keeps_lowest_id(docs_ds):
    docs, ds = docs_ds
    kept = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
    assert 3 in kept and 10 not in kept
    assert 5 in kept and 20 not in kept
    assert len(kept) == len(set(docs))


def test_exact_dup_groups(docs_ds):
    docs, ds = docs_ds
    rows = exact_dup_groups(ds).take_all()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    dups = {r["keeper"]: r["n_docs"] for r in rows if r["n_docs"] > 1}
    assert dups == {3: 2, 5: 2}


def test_minhash_finds_near_dups(docs_ds):
    docs, ds = docs_ds
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(ds, threshold=0.5).take_all()}
    assert (3, 10) in pairs and (5, 20) in pairs       # exact dups
    assert (7, 30) in pairs                            # one-token insertion
    # unrelated shuffles should not near-dup at 0.5 (shingle order differs)
    assert all(ngram_jaccard(docs[a], docs[b]) > 0.2 for a, b in pairs)


def test_simhash_finds_exact_dups(docs_ds):
    docs, ds = docs_ds
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_pairs(ds, max_hamming=3).take_all()}
    assert pairs[(3, 10)] == 0 and pairs[(5, 20)] == 0
    # simhash over unigram bags: doc40 == doc7 with one word swapped
    assert (7, 40) in pairs


def test_verify_pairs_jaccard(docs_ds, ray_session):
    docs, ds = docs_ds
    import ray.data as rd

    cand = rd.from_arrow(pa.table({
        "id_a": pa.array([3, 7, 0], pa.int64()),
        "id_b": pa.array([10, 30, 1], pa.int64()),
    }))
    out = verify_pairs_jaccard(cand, ds, threshold=0.5)
    got = {(int(r.id_a), int(r.id_b)): float(r.jaccard)
           for r in out.itertuples()}
    assert got[(3, 10)] == 1.0
    assert 0.5 <= got[(7, 30)] < 1.0
    assert (0, 1) not in got


def test_shingle_hashes_stable_and_order_sensitive():
    tok = get_tokenizer("simple")
    a = _shingle_hashes(tok("one two three four"), 3)
    b = _shingle_hashes(tok("one two three four"), 3)
    np.testing.assert_array_equal(a, b)
    c = _shingle_hashes(tok("four three two one"), 3)
    assert set(a.tolist()) != set(c.tolist())


def test_ngram_jaccard_bounds():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0
    assert ngram_jaccard("", "") == 1.0


def test_exact_dedup_join_fallback(ray_session):
    """Above broadcast_max_losers the loser filter becomes a hash-partitioned
    semi-join on (content_hash, keeper id) — same winners as the broadcast
    path."""
    import pyarrow as pa
    import ray.data as rd

    from trinity_ray.ops.dedup import exact_dedup

    docs = [f"doc {i % 5}" for i in range(40)]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(40), pa.int64()),
                                 "text": pa.array(docs)}))
    via_join = exact_dedup(ds, broadcast_max_losers=0).to_pandas()
    via_bcast = exact_dedup(ds).to_pandas()
    a = sorted(via_join["doc_id"].tolist())
    b = sorted(via_bcast["doc_id"].tolist())
    assert a == b == [0, 1, 2, 3, 4]


def test_clean_corpus_composition(ray_session):
    """The composed cleaning pipeline: every surviving doc is an exact-dup
    keeper, not a verified near-dup loser, >=5 words, and English."""
    import ray.data as rd

    from trinity_ray.pipelines.clean import clean_corpus

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = clean_corpus(ds).to_pandas()
    assert 0 < len(out) <= 500
    assert (out["n_words"] >= 5).all()
    assert (out["lang_pred"] == "en").all()
    assert out["doc_id"].is_unique


def test_minhash_partial_count_fallback(ray_session, monkeypatch):
    """Forcing the degenerate-corpus guard must route bucket counting
    through the native aggregate with identical pairs."""
    import pyarrow.parquet as pq
    import ray.data as rd

    import trinity_ray.ops.dedup as dd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    fast = dd.minhash_lsh_pairs(ds).to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    monkeypatch.setattr(dd, "PARTIAL_COUNT_MAX", 0)
    slow = dd.minhash_lsh_pairs(ds).to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    assert fast.equals(slow)
