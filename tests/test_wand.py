"""Max-score/WAND pruned execution must be bit-identical to the exhaustive
path, and every pluggable scorer must match the pure-Python oracle
(SURVEY.md §5 items 1 and 3; scorer formulas: similarity.h:56-255)."""

from __future__ import annotations

import numpy as np
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.oracle import OracleIndex
from trinity_ray.query.ast import Or, Token, parse_query
from trinity_ray.query.exec import SegmentReader, _topk
from trinity_ray.query.scorers import get_scorer
from trinity_ray.search import LocalSearcher

VOCAB_HOT = ["the", "def", "return", "import"]          # df ~ corpus
VOCAB_MID = [f"mid{i}" for i in range(20)]
VOCAB_RARE = [f"rare{i}" for i in range(200)]


def synth_corpus(n_docs: int, seed: int = 7) -> list[str]:
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n_docs):
        words = []
        words += list(rng.choice(VOCAB_HOT, rng.integers(1, 12)))
        words += list(rng.choice(VOCAB_MID, rng.integers(0, 6)))
        if rng.random() < 0.3:
            words += list(rng.choice(VOCAB_RARE, rng.integers(1, 3)))
        rng.shuffle(words)
        docs.append(" ".join(words))
    return docs


@pytest.fixture(scope="module")
def wand_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("wand")
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = synth_corpus(3000)
    pq.write_table(pa.table({"text": docs}), str(tmp / "docs.parquet"),
                   row_group_size=500)  # 6 row groups -> 6 segments
    idx = str(tmp / "index")
    build_index(str(tmp / "docs.parquet"), idx, content_column="text",
                tokenizer="simple", positions=True,
                target_rows_per_partition=500)
    oracle = OracleIndex("simple")
    for i, d in enumerate(docs):
        oracle.add(i, d)
    return idx, oracle


QUERIES = [
    "the",
    "rare3",
    "rare1 OR rare2",
    "the OR rare5",
    "the OR def OR rare7",
    "the OR def OR return OR import",
    "mid1 OR mid2 OR rare11 OR the",
    "nosuchterm OR rare4",
    "mid3 OR mid4 OR mid5",
]


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("k", [1, 3, 10, 100])
def test_maxscore_matches_exhaustive(wand_index, q, k):
    """Pruned and exhaustive per-segment execution agree exactly."""
    idx, _ = wand_index
    s = LocalSearcher(idx)
    node = parse_query(q, "simple")
    weights = s.resolve_idf(node)
    sc = get_scorer("bm25")
    for r in s.readers:
        fast_d, fast_s = r.execute(node, weights, k)
        # exhaustive reference on a fresh reader (no shared caches)
        r2 = SegmentReader(r.seg_path, r.doc_base, r.doc_count, mask=r.mask)
        matched = r2.match(node)
        scores = r2.score(matched, weights, sc)
        slow_d, slow_s = _topk(matched, scores, k)
        np.testing.assert_array_equal(fast_d, slow_d)
        np.testing.assert_array_equal(fast_s, slow_s)  # bit-identical


@pytest.mark.parametrize("q", QUERIES)
def test_maxscore_rank_identical_to_oracle(wand_index, q):
    idx, oracle = wand_index
    s = LocalSearcher(idx)
    got = s.search(q, k=10)
    want = oracle.search(q, k=10)
    assert [int(d) for d in got.doc_ids] == [d for d, _ in want]
    np.testing.assert_allclose(got.scores, [sc for _, sc in want], rtol=1e-12)


@pytest.mark.parametrize("scorer", ["bm25", "tfidf", "trivial"])
def test_scorers_match_oracle(wand_index, scorer):
    idx, oracle = wand_index
    s = LocalSearcher(idx)
    for q in ["the OR rare5", "mid1 mid2", '"the def"', "rare1 OR mid7"]:
        got = s.search(q, k=10, scorer=scorer)
        want = oracle.search(q, k=10, scorer=scorer)
        assert [int(d) for d in got.doc_ids] == [d for d, _ in want], (scorer, q)
        np.testing.assert_allclose(got.scores, [sc for _, sc in want],
                                   rtol=1e-12)


def test_maxscore_prunes_hot_term_decode(tmp_path, ray_session):
    """On 'needle OR hot', once the high-tf needle docs fill the top-k the
    hot term must NOT be fully decoded — its blocks are touched selectively
    through the skiplist (the point of block-max WAND)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 8000
    docs = ["the filler"] * n
    needles = list(range(100, 1300, 100))  # 12 docs, spread across blocks
    for d in needles:
        docs[d] = "the " + " ".join(["needle"] * 6)
    pq.write_table(pa.table({"text": docs}), str(tmp_path / "docs.parquet"))
    idx = str(tmp_path / "index")
    build_index(str(tmp_path / "docs.parquet"), idx, content_column="text",
                tokenizer="simple", positions=False)
    s = LocalSearcher(idx)
    node = parse_query("needle OR the", "simple")
    weights = s.resolve_idf(node)
    for r in s.readers:
        got_d, got_s = r.execute(node, weights, 10)
        hot = r.postings("THE")
        assert hot is not None and hot._docs is None, "hot term fully decoded"
        assert hot._blocks, "hot term should be probed block-selectively"
        # and the result still matches the exhaustive path
        r2 = SegmentReader(r.seg_path, r.doc_base, r.doc_count)
        matched = r2.match(node)
        slow = _topk(matched, r2.score(matched, weights), 10)
        np.testing.assert_array_equal(got_d, slow[0])
        np.testing.assert_array_equal(got_s, slow[1])


def test_random_or_queries_property(wand_index):
    """Randomized flat disjunctions: pruned == exhaustive for many draws."""
    idx, _ = wand_index
    s = LocalSearcher(idx)
    rng = np.random.default_rng(42)
    vocab = [t.upper() for t in (VOCAB_HOT + VOCAB_MID + VOCAB_RARE[:40])]
    for trial in range(25):
        n_terms = int(rng.integers(1, 6))
        terms = list(rng.choice(vocab, n_terms, replace=False))
        node = Or(tuple(Token(t) for t in terms)) if n_terms > 1 else Token(terms[0])
        weights = s.resolve_idf(node)
        k = int(rng.choice([1, 5, 10, 50]))
        for r in s.readers:
            fast = r.execute(node, weights, k)
            r2 = SegmentReader(r.seg_path, r.doc_base, r.doc_count, mask=r.mask)
            matched = r2.match(node)
            slow = _topk(matched, r2.score(matched, weights), k)
            np.testing.assert_array_equal(fast[0], slow[0], err_msg=str(terms))
            np.testing.assert_array_equal(fast[1], slow[1], err_msg=str(terms))


def test_phrase_selective_positions(tmp_path, ray_session):
    """Phrase with a rare lead and a hot tail: the hot term's positions must
    be decoded block-selectively (never the full stream), and the result
    must match the pure-Python oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 6000
    docs = ["alpha beta the gamma"] * n     # hot: THE (never after NEEDLE)
    hits = list(range(50, 2400, 200))       # 12 docs contain "needle the"
    for d in hits:
        docs[d] = "prefix needle the suffix"
    pq.write_table(pa.table({"text": docs}), str(tmp_path / "d.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, content_column="text",
                tokenizer="simple", positions=True)
    oracle = OracleIndex("simple")
    for i, d in enumerate(docs):
        oracle.add(i, d)
    s = LocalSearcher(idx)
    got = s.search('"needle the"', k=20)
    want = oracle.search('"needle the"', k=20)
    assert [int(d) for d in got.doc_ids] == [d for d, _ in want]
    assert sorted(int(d) for d in got.doc_ids) == hits
    for r in s.readers:
        hot = r.postings("THE")
        assert hot is not None
        assert hot._pos is None, "hot term positions fully decoded"
        assert hot._blocks_pos, "expected selective block position decode"
