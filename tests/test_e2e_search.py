"""E2E: build index with Ray Data -> query -> rank-identical to the oracle
(SURVEY.md §5 item 1; BASELINE.md invariant rows)."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.fixtures import REFERENCE_QUERIES, write_corpus
from trinity_ray.index.build import build_index
from trinity_ray.oracle import OracleIndex
from trinity_ray.search import LocalSearcher, RaySearcher

N_DOCS = 1200


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), N_DOCS, n_files=3, seed=42, row_group_size=256)
    return str(d)


@pytest.fixture(scope="module")
def index_dir(ray_session, corpus_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("index")
    build_index(
        corpus_dir,
        str(d),
        content_column="content",
        id_columns=("repo", "path", "commit", "lang"),
        tokenizer="trinity",
        positions=True,
        target_rows_per_partition=300,
        concurrency=3,
    )
    return str(d)


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    idx = OracleIndex(tokenizer="trinity")
    doc_id = 0
    for f in sorted(os.listdir(corpus_dir)):
        tbl = pq.read_table(os.path.join(corpus_dir, f), columns=["content"])
        for text in tbl.column("content").to_pylist():
            idx.add(doc_id, text)
            doc_id += 1
    return idx


def test_manifest_covers_all_docs(index_dir):
    s = LocalSearcher(index_dir)
    assert int(s.n_docs) == N_DOCS
    segs = s.manifest.segments
    assert segs[0].doc_base == 0
    for a, b in zip(segs, segs[1:]):
        assert b.doc_base == a.doc_end  # contiguous per-partition docID ranges


def test_sha256_invariant(index_dir, corpus_dir):
    """Per-row content sha256 equality vs reference through every stage
    (BASELINE.json input_hint)."""
    import glob

    expected = {}
    doc_id = 0
    for f in sorted(os.listdir(corpus_dir)):
        for text in pq.read_table(os.path.join(corpus_dir, f), columns=["content"]).column("content").to_pylist():
            expected[doc_id] = hashlib.sha256(text.encode()).hexdigest()
            doc_id += 1
    got = {}
    for p in glob.glob(os.path.join(index_dir, "segments", "*", "docs.parquet")):
        t = pq.read_table(p, columns=["doc_id", "content_sha256"])
        for d, h in zip(t.column("doc_id").to_pylist(), t.column("content_sha256").to_pylist()):
            got[d] = h
    assert got == expected


@pytest.mark.parametrize("name,kind,text", REFERENCE_QUERIES,
                         ids=[q[0] for q in REFERENCE_QUERIES])
def test_rank_identity_vs_oracle(index_dir, oracle, name, kind, text):
    s = LocalSearcher(index_dir)
    got = s.search(text, k=10)
    want = oracle.search(text, k=10)
    got_ids = [int(d) for d in got.doc_ids]
    want_ids = [d for d, _ in want]
    assert got_ids == want_ids, f"{name}: doc ranking differs"
    np.testing.assert_allclose(
        got.scores, [sc for _, sc in want], rtol=1e-12, atol=1e-12,
        err_msg=f"{name}: scores differ",
    )


def test_full_result_set_matches(index_dir, oracle):
    """Not just top-10: the complete matched doc set agrees (k=0 = all)."""
    for _, _, text in REFERENCE_QUERIES[:8]:
        got = LocalSearcher(index_dir).search(text, k=0)
        want = oracle.search(text, k=0)
        assert [int(d) for d in got.doc_ids] == [d for d, _ in want]


def test_ray_searcher_matches_local(ray_session, index_dir):
    rs = RaySearcher(index_dir, num_actors=2)
    ls = LocalSearcher(index_dir)
    queries = [t for _, _, t in REFERENCE_QUERIES[:10]]
    many = rs.search_many(queries, k=10)
    for q, rr in zip(queries, many):
        lr = ls.search(q, k=10)
        assert [int(d) for d in rr.doc_ids] == [int(d) for d in lr.doc_ids]
        np.testing.assert_allclose(rr.scores, lr.scores, rtol=0, atol=0)


def test_build_determinism_across_parallelism(ray_session, corpus_dir, tmp_path):
    """Same corpus at different parallelism/partitioning -> identical results
    (SURVEY.md §5 item 5)."""
    d1, d2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(corpus_dir, d1, id_columns=("repo",), target_rows_per_partition=200,
                concurrency=1)
    build_index(corpus_dir, d2, id_columns=("repo",), target_rows_per_partition=1000,
                concurrency=3)
    s1, s2 = LocalSearcher(d1), LocalSearcher(d2)
    for _, _, text in REFERENCE_QUERIES[:8]:
        r1, r2 = s1.search(text, k=10), s2.search(text, k=10)
        assert [int(x) for x in r1.doc_ids] == [int(x) for x in r2.doc_ids]
        np.testing.assert_allclose(r1.scores, r2.scores, rtol=0, atol=0)


def test_adaptive_default_partition_plan(ray_session, corpus_dir, tmp_path):
    """A default-args build plans from the CORPUS ONLY: the formula clamps
    are pinned here because a resumed default-args build must re-plan
    identically on any cluster (or every checkpointed segment fails the
    lineage check and rebuilds)."""
    from trinity_ray.index.build import default_target_rows, plan_partitions

    # formula clamps: tiny corpora floor at 1024, huge cap at 250k, and the
    # mid-range targets ~128 partitions (total // 128 + 1)
    assert default_target_rows(10) == 1024
    assert default_target_rows(1_280_000) == 10_001
    assert default_target_rows(10**9) == 250_000
    assert default_target_rows(500_000) == 500_000 // 128 + 1

    # a default-args build uses exactly plan_partitions(corpus,
    # default_target_rows(total)) — same segment names, bases, and row
    # splits regardless of concurrency (not an input to planning)
    d = str(tmp_path / "adaptive")
    m = build_index(corpus_dir, d, concurrency=2)
    expected = plan_partitions(corpus_dir,
                               target_rows=default_target_rows(N_DOCS))
    assert [(s.doc_base, s.doc_count) for s in m.segments] \
        == [(s.doc_base, s.rows) for s in expected]
    assert sum(s.doc_count for s in m.segments) == N_DOCS


def test_resume_skips_complete_segments(ray_session, corpus_dir, tmp_path):
    d = str(tmp_path / "resumed")
    m1 = build_index(corpus_dir, d, target_rows_per_partition=300)
    # second run over the same dir must resume every partition
    import ray.data as rd

    from trinity_ray.index.build import SegmentBuilder, plan_partitions

    specs = plan_partitions(corpus_dir, target_rows=300)
    b = SegmentBuilder(d, "content", (), "trinity", True, 0)
    res = [b._build_one(s.to_row()) for s in specs]
    assert all(r["resumed"] for r in res)
    assert [r["name"] for r in res] == [s.name for s in m1.segments]


def test_topk_tie_break_across_cutoff(index_dir, oracle):
    """Score ties straddling the k cutoff must break (score desc, doc_id asc).

    A MatchAll-style query gives every doc the same (zero) score — the
    harshest tie case; regression for the argpartition tie bug."""
    s = LocalSearcher(index_dir)
    r = s.search("", k=7)
    assert [int(d) for d in r.doc_ids] == [0, 1, 2, 3, 4, 5, 6]
    # hot term: many equal-tf docs -> equal scores; compare vs oracle
    r2 = s.search("return", k=25)
    want = oracle.search("return", k=25)
    assert [int(d) for d in r2.doc_ids] == [d for d, _ in want]


def test_batch_search_dataset(index_dir, ray_session):
    """Dataset batch-of-queries path == individual searches (SURVEY §3.3)."""
    import ray.data as rd

    from trinity_ray.search import LocalSearcher, batch_search

    queries = ["key", "key AND order", '"key order"', "dup OR vector"]
    ds = rd.from_items([{"query": q} for q in queries])
    got = batch_search(ds, index_dir, k=5, concurrency=2).to_pandas()
    s = LocalSearcher(index_dir)
    for q in queries:
        sub = got[got["query"] == q].sort_values("rank")
        res = s.search(q, k=5)
        assert sub["doc_id"].tolist() == [int(d) for d in res.doc_ids], q
        np.testing.assert_allclose(sub["score"].to_numpy(), res.scores)


def test_lazy_dictionary_probe_path(index_dir, monkeypatch):
    """Huge-dictionary segments probe via row-group pruning; results equal
    the eager-dict path (terms.cpp:8-103 skiplist analogue)."""
    import trinity_ray.query.exec as qe

    eager = LocalSearcher(index_dir)
    res_e = eager.search("key AND order", k=10)
    monkeypatch.setattr(qe, "_EAGER_DICT_MAX", 0)  # force lazy everywhere
    lazy = LocalSearcher(index_dir)
    res_l = lazy.search("key AND order", k=10)
    assert lazy.readers[0]._dict is None and lazy.readers[0]._rg_index
    np.testing.assert_array_equal(res_e.doc_ids, res_l.doc_ids)
    np.testing.assert_array_equal(res_e.scores, res_l.scores)
    # absent terms resolve to df 0 without error
    assert lazy.readers[0].lookup_terms(["ZZNOSUCH"]) == {"ZZNOSUCH": 0}


def test_rich_match_mode(index_dir, ray_session):
    """Rich-match (reference default mode, exec.h:11-43): per-(doc, term)
    tf + positions for the top-k; Ray scatter-gather == local; tf equals
    the count of positions; every top-k doc appears."""
    from trinity_ray.search import LocalSearcher, RaySearcher

    s = LocalSearcher(index_dir)
    res, tbl = s.search_rich("key OR order", k=10)
    plain = s.search("key OR order", k=10)
    np.testing.assert_array_equal(res.doc_ids, plain.doc_ids)
    df = tbl.to_pandas()
    assert set(df["doc_id"]) == set(int(d) for d in plain.doc_ids)
    # tf == len(positions), positions ascending and 1-based
    for _, r in df.iterrows():
        assert r["tf"] == len(r["positions"]) and r["tf"] >= 1
        assert list(r["positions"]) == sorted(r["positions"])
        assert r["positions"][0] >= 1
    # score column matches the scalar search result per doc
    sc = {int(d): float(x) for d, x in zip(plain.doc_ids, plain.scores)}
    for _, r in df.iterrows():
        assert abs(sc[int(r["doc_id"])] - r["score"]) < 1e-12
    rs = RaySearcher(index_dir, num_actors=2)
    _, tbl2 = rs.search_rich("key OR order", k=10)
    assert tbl.equals(tbl2)


def test_app_prefilter_seams(index_dir, ray_session):
    """IndexDocumentsFilter / VectorIDs seams: filter_ids and doc_predicate
    restrict matching but NOT stats; max-score path stays bit-identical to
    exhaustive; RaySearcher == LocalSearcher."""
    from trinity_ray.query.ast import parse_query
    from trinity_ray.search import LocalSearcher, RaySearcher, merge_topk

    s = LocalSearcher(index_dir)
    full = s.search("key", k=0)
    even = np.asarray(
        sorted(int(d) for d in full.doc_ids if d % 2 == 0), dtype=np.uint64)
    res = s.search("key", k=10, filter_ids=np.arange(
        0, int(s.n_docs), 2, dtype=np.uint64))
    assert all(int(d) % 2 == 0 for d in res.doc_ids)
    # scores equal the unfiltered scores of the same docs (stats untouched)
    sc = {int(d): float(x) for d, x in zip(full.doc_ids, full.scores)}
    for d, x in zip(res.doc_ids, res.scores):
        assert abs(sc[int(d)] - float(x)) < 1e-12
    # predicate seam gives the same answer as the explicit id set
    res_p = s.search("key", k=10,
                     doc_predicate=lambda t:
                     t.column("doc_id").to_numpy() % 2 == 0)
    np.testing.assert_array_equal(res.doc_ids, res_p.doc_ids)
    np.testing.assert_array_equal(res.scores, res_p.scores)
    # max-score (single/flat-OR) path vs exhaustive path under a filter:
    # force exhaustive by scoring via explicit weights on a parsed node
    node = parse_query("key OR order", s.manifest.tokenizer)
    idf = s.resolve_idf(node)
    allowed_global = np.arange(0, int(s.n_docs), 2, dtype=np.uint64)
    from trinity_ray.search import _combine_allowed
    parts_w, parts_e = [], []
    for r in s.readers:
        allowed = _combine_allowed(r, allowed_global, None)
        parts_w.append(r.execute(node, idf, 10, "bm25", allowed=allowed))
        m = r.match(node)
        m = m[np.isin(m, allowed)]
        sc2 = r.score(m, idf)
        parts_e.append((m, sc2))
    w = merge_topk([p for p in parts_w if p[0].size], 10)
    e = merge_topk([p for p in parts_e if p[0].size], 10)
    np.testing.assert_array_equal(w.doc_ids, e.doc_ids)
    np.testing.assert_array_equal(w.scores, e.scores)
    # distributed parity
    rs = RaySearcher(index_dir, num_actors=2)
    res_r = rs.search("key", k=10,
                      doc_predicate=lambda t:
                      t.column("doc_id").to_numpy() % 2 == 0)
    np.testing.assert_array_equal(res.doc_ids, res_r.doc_ids)
    np.testing.assert_array_equal(res.scores, res_r.scores)


def test_subtree_scoring(index_dir, ray_session):
    """Accumulated-score OR-of-subtrees (docset_spans.cpp:304): branch
    terms are gated on branch match; flat token ORs degrade to plain
    execute bit-identically; ray == local."""
    from trinity_ray.search import LocalSearcher, RaySearcher

    s = LocalSearcher(index_dir)
    # flat OR of tokens: identical to plain scoring
    a = s.search_subtrees("key OR dup", k=10)
    b = s.search("key OR dup", k=10)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)
    # phrase-gated branch: docs with loose key+order but no adjacency get
    # no contribution from that branch
    r = s.search_subtrees('"key order" OR dup', k=0)
    phrase_docs = set(int(d) for d in s.search('"key order"', k=0).doc_ids)
    dup_docs = set(int(d) for d in s.search("dup", k=0).doc_ids)
    assert set(int(d) for d in r.doc_ids) == phrase_docs | dup_docs
    rs = RaySearcher(index_dir, num_actors=2)
    r2 = rs.search_subtrees('"key order" OR dup', k=10)
    r1 = s.search_subtrees('"key order" OR dup', k=10)
    np.testing.assert_array_equal(r1.doc_ids, r2.doc_ids)
    np.testing.assert_array_equal(r1.scores, r2.scores)


def test_sequence_rerank(index_dir, ray_session):
    """Matched-sequence proximity (assign_query_indices/toNextSpan
    geometry): adjacency bonus reranks; bonus=0 is a no-op; runs longer
    than 2 chain correctly."""
    from trinity_ray.search import (
        LocalSearcher,
        longest_matched_sequence,
        sequence_rerank,
    )

    s = LocalSearcher(index_dir)
    base = s.search("key AND order", k=0)
    n_match = base.doc_ids.size
    r = sequence_rerank(s, "key AND order", k=10, pool=n_match, bonus=0.5)
    phrase_docs = set(int(d) for d in s.search('"key order"', k=0).doc_ids)
    # every doc with the adjacent phrase outranks every doc without it
    got = [int(d) for d in r.doc_ids]
    in_phrase = [d in phrase_docs for d in got]
    if any(in_phrase) and not all(in_phrase):
        last_phrase = max(i for i, x in enumerate(in_phrase) if x)
        first_plain = min(i for i, x in enumerate(in_phrase) if not x)
        assert last_phrase < first_plain or \
            r.scores[last_phrase] >= r.scores[first_plain]
    # bonus=0 reproduces plain BM25 order
    r0 = sequence_rerank(s, "key AND order", k=10, pool=n_match, bonus=0.0)
    plain = s.search("key AND order", k=10)
    np.testing.assert_array_equal(r0.doc_ids, plain.doc_ids)
    np.testing.assert_allclose(r0.scores, plain.scores)
    # chain math
    e = np.empty(0, dtype=np.int64)
    assert longest_matched_sequence(
        [np.array([4]), np.array([5]), np.array([6]), np.array([7])]) == 4
    assert longest_matched_sequence(
        [np.array([4, 9]), np.array([10]), np.array([11])]) == 3
    assert longest_matched_sequence([e, np.array([1])]) == 1


def test_search_sequence_in_engine(index_dir, ray_session):
    """In-engine matched-sequence scoring (execute_sequence): bit-identical
    to the full-pool rerank, exact at bounded k, and the vectorized
    per-segment kernel equals the per-doc reference chain on every
    matching doc."""
    from trinity_ray.query.ast import collect_scorable_terms, parse_query
    from trinity_ray.search import (
        LocalSearcher,
        RaySearcher,
        longest_matched_sequence,
        sequence_rerank,
    )

    s = LocalSearcher(index_dir)
    for q in ("key AND order", "dup OR vector", "key order status"):
        base = s.search(q, k=0)
        full = sequence_rerank(s, q, k=10, pool=max(1, base.doc_ids.size),
                               bonus=0.5)
        # pin the rerank's FLAT geometry (one index per distinct token):
        # the default is now assign_query_indices, where OR branches
        # overlap at one index and thus never chain into a run
        node_q = parse_query(q, s.manifest.tokenizer)
        eng = s.search_sequence(q, k=10, bonus=0.5,
                                index_terms=collect_scorable_terms(node_q))
        np.testing.assert_array_equal(eng.doc_ids, full.doc_ids)
        np.testing.assert_allclose(eng.scores, full.scores, rtol=0, atol=0)
    # kernel vs per-doc reference: every matched doc, via rich positions
    q = "key AND order"
    node = parse_query(q, s.manifest.tokenizer)
    seq = collect_scorable_terms(node)
    _res, tbl = s.search_rich(q, k=0)
    by_doc: dict[int, dict[str, np.ndarray]] = {}
    for d, t, p in zip(tbl.column("doc_id").to_pylist(),
                       tbl.column("term").to_pylist(),
                       tbl.column("positions").to_pylist()):
        by_doc.setdefault(int(d), {})[t] = np.asarray(p, dtype=np.int64)
    empty = np.empty(0, dtype=np.int64)
    for r in s.readers:
        idf = s.resolve_idf(node)
        matched = r.match(node)
        if r.mask is not None and matched.size:
            matched = matched[~np.isin(matched, r.mask)]
        lengths = r.sequence_lengths(matched, seq)
        for d, L in zip(matched, lengths):
            tp = by_doc.get(int(d), {})
            want = longest_matched_sequence(
                [tp.get(t, empty) for t in seq])
            assert L == want, (int(d), L, want)
    # distributed path agrees with local
    rs = RaySearcher(index_dir, num_actors=2)
    r1 = s.search_sequence("key AND order", k=10)
    r2 = rs.search_sequence("key AND order", k=10)
    np.testing.assert_array_equal(r1.doc_ids, r2.doc_ids)
    np.testing.assert_array_equal(r1.scores, r2.scores)


def test_suggest_terms_prefix_scan(index_dir, monkeypatch):
    """Dictionary prefix suggestions: eager and lazy (row-group-pruned)
    paths agree; df ordering with lexicographic ties; merged-boundary
    overlap handled by the range-intersection scan."""
    import trinity_ray.query.exec as qe
    from trinity_ray.search import LocalSearcher

    s = LocalSearcher(index_dir)
    got = s.suggest_terms("re", k=20)  # normalized via the index tokenizer
    assert got and all(t.startswith("RE") for t, _ in got)
    assert "RETURN" in dict(got)
    assert s.suggest_terms("RE", k=20) == got
    dfs = [d for _, d in got]
    assert dfs == sorted(dfs, reverse=True)
    # df values agree with direct lookups
    for t, d in got[:5]:
        assert sum(r.lookup_terms([t])[t] for r in s.readers) == d
    monkeypatch.setattr(qe, "_EAGER_DICT_MAX", 0)
    lazy = LocalSearcher(index_dir)
    assert lazy.suggest_terms("RE", k=20) == got


def test_fuzzy_terms_edit1(index_dir, monkeypatch):
    """SymSpell deletion-neighborhood probe == brute-force Levenshtein<=1
    over the whole dictionary (identity, substitution, insertion,
    deletion; transpositions are distance 2 and must be excluded); eager
    and lazy dictionary modes agree; dfs match direct lookups."""
    import trinity_ray.query.exec as qe
    from trinity_ray.query.exec import _edit1
    from trinity_ray.search import LocalSearcher

    # _edit1 parity with a tiny reference implementation
    def lev(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    words = ["", "A", "AB", "BA", "ABC", "ACB", "BAC", "ABCD", "AXC",
             "ABX", "XBC", "ABCX", "XABC", "AC", "ABCDE"]
    for a in words:
        for b in words:
            assert _edit1(a, b) == (lev(a, b) <= 1), (a, b)

    s = LocalSearcher(index_dir)
    # pick a real dictionary term and probe a 1-char corruption of it
    term, _ = s.suggest_terms("RE", k=1)[0]
    probe = "X" + term[1:]
    got = dict(s.fuzzy_terms(probe, k=100))
    # brute-force over the full dictionary
    want = {}
    for r in s.readers:
        for t, df in r._iter_terms():
            if lev(probe, t) <= 1:
                want[t] = want.get(t, 0) + df
    assert got == want and term in got
    # identity probe includes the term itself with its global df
    got_id = dict(s.fuzzy_terms(term, k=100))
    assert got_id[term] == sum(
        r.lookup_terms([term])[term] for r in s.readers)
    # lazy dictionary mode builds the same sidecar
    monkeypatch.setattr(qe, "_EAGER_DICT_MAX", 0)
    lazy = LocalSearcher(index_dir)
    assert dict(lazy.fuzzy_terms(probe, k=100)) == want


def test_fuzzy_query_expansion(index_dir, ray_session):
    """[fuzzy t] search == explicit weighted-OR expansion: exact term at
    weight 1.0, edit-1 neighbors at 0.5; And of multiple fuzzy terms;
    distributed path agrees with local (global-df expansion)."""
    from trinity_ray.query.ast import And, Fuzzy, Or, Token, parse_query
    from trinity_ray.search import LocalSearcher, RaySearcher

    s = LocalSearcher(index_dir)
    node = parse_query("[fuzzy return]", "trinity")
    assert node == Fuzzy("RETURN")
    assert parse_query("[fuzzy return static]", "trinity") == \
        And((Fuzzy("RETURN"), Fuzzy("STATIC")))
    # pick a dictionary term that actually HAS edit-1 neighbors (corpus is
    # synthetic; don't hardcode which identifiers collide)
    probe = None
    for t, _df in sorted(s.readers[0]._iter_terms()):
        if len(t) >= 3 and len(s._edit1_merged(t)) > 1:
            probe = t
            break
    assert probe is not None, "fixture corpus has no edit-1 term pair"
    near = s._edit1_merged(probe)
    alts = sorted(((t, d) for t, d in near.items() if t != probe),
                  key=lambda kv: (-kv[1], kv[0]))[:16]
    manual = Or((Token(probe),) + tuple(Token(t, 0.5) for t, _ in alts))
    q = f"[fuzzy {probe}]"
    r_fuzzy = s.search(q, k=10)
    r_manual = s.search(manual, k=10)
    np.testing.assert_array_equal(r_fuzzy.doc_ids, r_manual.doc_ids)
    np.testing.assert_allclose(r_fuzzy.scores, r_manual.scores)
    # neighbors really contribute: never below the exact-only score
    assert r_fuzzy.scores[0] >= s.search(probe, k=10).scores[0]
    # distributed expansion uses merged global df -> identical results
    rs = RaySearcher(index_dir, num_actors=2)
    r_ray = rs.search(q, k=10)
    np.testing.assert_array_equal(r_fuzzy.doc_ids, r_ray.doc_ids)
    np.testing.assert_allclose(r_fuzzy.scores, r_ray.scores)
    # unexpanded Fuzzy degrades to the exact term (no-index contexts)
    from trinity_ray.oracle import OracleIndex  # noqa: F401 (import check)
    assert Fuzzy("RETURN").term == "RETURN"


def test_batch_search_modes(index_dir, ray_session):
    """batch_search mode='rich'/'subtrees': per-query outputs equal the
    scalar API."""
    import ray.data as rd

    from trinity_ray.search import LocalSearcher, batch_search

    queries = ["return", "encode AND decode"]
    ds = rd.from_items([{"query": q} for q in queries])
    rich = batch_search(ds, index_dir, k=5, concurrency=2,
                        mode="rich").to_pandas()
    s = LocalSearcher(index_dir)
    for q in queries:
        sub = rich[rich["query"] == q].reset_index(drop=True)
        _, tbl = s.search_rich(q, k=5)
        ref = tbl.to_pandas()
        assert sub["doc_id"].tolist() == ref["doc_id"].tolist()
        assert sub["tf"].tolist() == ref["tf"].tolist()
    st = batch_search(ds, index_dir, k=5, concurrency=2,
                      mode="subtrees").to_pandas()
    for q in queries:
        sub = st[st["query"] == q].sort_values("rank")
        ref = s.search_subtrees(q, k=5)
        assert sub["doc_id"].tolist() == [int(d) for d in ref.doc_ids]


def test_batch_rich_empty_blocks_stable_schema(index_dir, ray_session):
    """Rich-mode batch search with zero-hit queries and empty blocks keeps
    one stable schema (review finding: concat_tables([]) crashed and
    payload columns drifted)."""
    import ray.data as rd

    from trinity_ray.search import batch_search

    ds = rd.from_items([{"query": "zzznothing"}] * 3).repartition(6)
    out = batch_search(ds, index_dir, k=5, concurrency=2, mode="rich")
    assert out.count() == 0
    names = set(out.schema().names)
    assert names >= {"query", "rank", "doc_id", "score", "term",
                     "tf", "positions"}


def test_doc_predicate_pushdown_and_cache(index_dir, ray_session, monkeypatch):
    """DocPredicate: column-pruned docs read, Arrow-expression pushdown, and
    per-(segment, key) id-set caching — a repeated query carrying the same
    predicate must NOT re-read docs.parquet (VERDICT r2 wrong-#2)."""
    import pyarrow.dataset as real_pads

    from trinity_ray.query import exec as qx
    from trinity_ray.search import LocalSearcher

    s = LocalSearcher(index_dir)
    legacy = s.search("key", k=10,
                      doc_predicate=lambda t:
                      t.column("doc_id").to_numpy() % 2 == 0)

    calls = {"n": 0, "columns": []}
    real_dataset = real_pads.dataset

    class CountingDataset:
        def __init__(self, ds):
            self._ds = ds

        @property
        def schema(self):
            return self._ds.schema

        def to_table(self, *a, **kw):
            calls["n"] += 1
            calls["columns"].append(kw.get("columns"))
            return self._ds.to_table(*a, **kw)

    monkeypatch.setattr(qx.pads, "dataset",
                        lambda *a, **kw: CountingDataset(real_dataset(*a, **kw)))
    pred = qx.DocPredicate(lambda t: t.column("doc_id").to_numpy() % 2 == 0,
                           columns=[], key="even")
    r1 = s.search("key", k=10, doc_predicate=pred)
    first_reads = calls["n"]
    assert first_reads >= 1
    # pruned to doc_id only, never a full-column read
    assert all(cols == ["doc_id"] for cols in calls["columns"])
    r2 = s.search("key", k=10, doc_predicate=pred)
    assert calls["n"] == first_reads  # cache hit: zero further docs reads
    np.testing.assert_array_equal(r1.doc_ids, legacy.doc_ids)
    np.testing.assert_array_equal(r2.doc_ids, r1.doc_ids)
    np.testing.assert_allclose(r2.scores, r1.scores)
    # expression-only predicate: filter pushed to the scan, key derived
    expr = real_pads.field("doc_id") >= 0
    pe = qx.DocPredicate(filter=expr)
    assert pe.key.startswith("expr:")
    r3 = s.search("key", k=10, doc_predicate=pe)
    plain = s.search("key", k=10)
    np.testing.assert_array_equal(r3.doc_ids, plain.doc_ids)


def test_batch_search_sequence_mode(index_dir, ray_session):
    """Dataset batch path mode="sequence" == per-query search_sequence."""
    import ray.data as rd

    from trinity_ray.search import LocalSearcher, batch_search

    queries = ["key AND order", "dup OR vector"]
    ds = rd.from_items([{"query": q} for q in queries])
    got = batch_search(ds, index_dir, k=5, concurrency=2,
                       mode="sequence").to_pandas()
    s = LocalSearcher(index_dir)
    for q in queries:
        sub = got[got["query"] == q].sort_values("rank")
        res = s.search_sequence(q, k=5)
        assert sub["doc_id"].tolist() == [int(d) for d in res.doc_ids], q
        np.testing.assert_allclose(sub["score"].to_numpy(), res.scores)


def test_assign_query_indices_geometry():
    """Reference query-index geometry (assign_query_indices,
    queries.cpp:1140-1249): phrase spans, AND adjacency, OR overlap with
    longest-branch resume, the NOT +4 gap, MatchSome exclusion."""
    from trinity_ray.query.ast import (
        And,
        MatchSome,
        Not,
        Optional_,
        Or,
        Phrase,
        Token,
        assign_query_indices,
    )

    t = Token
    # phrase occupies consecutive indices; AND children are adjacent
    g = assign_query_indices(And((Phrase(("A", "B")), t("C"))))
    assert g == [("A",), ("B",), ("C",)]
    # OR branches overlap at the same start index; alternatives merge
    g = assign_query_indices(Or((t("A"), t("B"))))
    assert g == [("A", "B")]
    # walk resumes at the LONGEST branch's end
    g = assign_query_indices(And((Or((Phrase(("A", "B")), t("C"))), t("D"))))
    assert g == [("A", "C"), ("B",), ("D",)]
    # NOT places nothing and leaves a 4-index adjacency gap
    g = assign_query_indices(And((t("A"), Not(t("X")), t("B"))))
    assert g == [("A",), (), (), (), (), ("B",)]
    # MatchSome members get no index; Optional_ descends
    g = assign_query_indices(
        And((MatchSome(1, (t("X"), t("Y"))), Optional_(t("A")))))
    assert g == [("A",)]
    # duplicate token occurrences each own an index (unlike the flat
    # distinct-terms geometry)
    g = assign_query_indices(And((t("A"), t("B"), t("A"))))
    assert g == [("A",), ("B",), ("A",)]


def test_search_sequence_default_geometry(index_dir):
    """Default search_sequence geometry is assign_query_indices: OR
    alternatives share ONE index (run length 1 — no adjacency bonus),
    matching the reference's overlapping-branch walk."""
    from trinity_ray.query.ast import assign_query_indices, parse_query
    from trinity_ray.search import LocalSearcher

    s = LocalSearcher(index_dir)
    q = "dup OR vector"
    node = parse_query(q, s.manifest.tokenizer)
    terms = sorted({t for grp in assign_query_indices(node) for t in grp})
    dflt = s.search_sequence(q, k=10, bonus=0.5)
    expl = s.search_sequence(q, k=10, bonus=0.5,
                             index_terms=[tuple(terms)])
    np.testing.assert_array_equal(dflt.doc_ids, expl.doc_ids)
    np.testing.assert_allclose(dflt.scores, expl.scores, rtol=0, atol=0)
    # single shared index => bonus contributes nothing: equals plain search
    base = s.search(q, k=10)
    np.testing.assert_array_equal(dflt.doc_ids, base.doc_ids)
    np.testing.assert_allclose(dflt.scores, base.scores, rtol=0, atol=0)


def test_doc_predicate_missing_column_raises(index_dir):
    """A DocPredicate declaring a column absent from docs metadata raises
    the SAME KeyError on the durable Parquet path and the in-memory table
    path — never a silently-narrower fn input (schema errors must not
    depend on segment kind)."""
    import pyarrow as pa

    from trinity_ray.query.exec import DocPredicate

    pred = DocPredicate(lambda t: np.ones(t.num_rows, bool),
                        columns=["no_such_col"], key="missing-col-test")
    s = LocalSearcher(index_dir)
    with pytest.raises(KeyError, match="no_such_col"):
        s.readers[0].doc_ids_where(pred)
    # in-memory evaluation path (what a RAM/live segment uses)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64())})
    with pytest.raises(KeyError, match="no_such_col"):
        pred.ids(t)


def test_sequence_lengths_fuzz_alternative_geometries(index_dir):
    """Property fuzz of the vectorized sequence kernel under the FULL
    geometry vocabulary the reference walk can produce: alternative
    tuples (OR overlap / rewrite provenance), gap indices (NOT), repeated
    terms — vs a per-doc brute force over the same positions."""
    import random

    s = LocalSearcher(index_dir)
    r = s.readers[0]
    vocab = ["KEY", "ORDER", "DUP", "VECTOR", "RETURN", "THE", "SCAN",
             "MERGE", "TABLE", "STATUS"]
    rng = random.Random(11)
    cand = r.universe()[:400]

    def doc_positions(term):
        tp = r.postings(term)
        if tp is None:
            return {}
        tf, found = tp.gather_tfs(cand)
        sub = cand[found]
        if sub.size == 0:
            return {}
        pos_flat, lens = tp.gather_positions(sub)
        out = {}
        start = 0
        for d, ln in zip(sub, lens):
            out[int(d)] = pos_flat[start:start + ln].astype(np.int64)
            start += ln
        return out

    pos_by_term = {t: doc_positions(t) for t in vocab}
    empty = np.empty(0, dtype=np.int64)

    def brute(doc, groups):
        # per-index position set = union over alternatives; gap = empty
        sets = [np.unique(np.concatenate(
                    [pos_by_term[t].get(doc, empty) for t in grp] or [empty]))
                for grp in groups]
        n = len(sets)
        best = min(1, sum(1 for p in sets if p.size))
        for j in range(n):
            if not sets[j].size:
                continue
            chain = sets[j]
            L = 1
            while j + L < n and chain.size:
                nxt = sets[j + L]
                if not nxt.size:
                    break
                chain = chain[np.isin(chain + 1, nxt)] + 1
                if chain.size:
                    L += 1
            best = max(best, L)
        return best

    for trial in range(40):
        n_idx = rng.randint(1, 6)
        groups = []
        for _ in range(n_idx):
            if rng.random() < 0.15:
                groups.append(())            # NOT-style gap index
            else:
                groups.append(tuple(rng.sample(vocab, rng.randint(1, 3))))
        lengths = r.sequence_lengths(cand, groups)
        # spot-check 25 random candidates per trial against brute force
        for i in rng.sample(range(cand.size), 25):
            want = brute(int(cand[i]), groups)
            assert lengths[i] == want, (
                trial, groups, int(cand[i]), int(lengths[i]), want,
                [[(t, pos_by_term[t].get(int(cand[i]))) for t in grp]
                 for grp in groups])


def test_sequence_bonus_clamped_for_no_seq_term_docs(index_dir, ray_session):
    """A matched doc containing NO indexed sequence term (sequence_lengths
    == 0, reachable via MatchSome / pure-synonym branches) must score
    base + 0, not base - bonus (ADVICE r3 #1)."""
    from trinity_ray.search import LocalSearcher

    s = LocalSearcher(index_dir)
    base = s.search("dup OR vector", k=0)
    assert base.doc_ids.size > 0
    # geometry carries only a term absent from the corpus: every matched
    # doc has run length 0 -> scores must equal the plain BM25 scores
    got = s.search_sequence("dup OR vector", k=0, bonus=0.5,
                            index_terms=["ZZZNOSUCHTERM"])
    np.testing.assert_array_equal(got.doc_ids, base.doc_ids)
    np.testing.assert_allclose(got.scores, base.scores, rtol=0, atol=0)
    # and a geometry where only SOME docs have the term: those docs must
    # never rank BELOW an equal-base doc without it
    one = s.search_sequence("dup OR vector", k=0, bonus=0.5,
                            index_terms=["DUP"])
    assert np.all(one.scores >= base.scores.min() - 1e-12)


def test_pred_cache_returns_frozen_array(index_dir, ray_session):
    """The per-(segment, key) cached id set is handed out by reference; a
    caller mutating it must fail loudly instead of corrupting every later
    query on a long-lived actor (ADVICE r3 #2)."""
    import pytest as _pytest

    from trinity_ray.query import exec as qx
    from trinity_ray.search import LocalSearcher

    s = LocalSearcher(index_dir)
    pred = qx.DocPredicate(lambda t: t.column("doc_id").to_numpy() % 2 == 0,
                           columns=[], key="freeze-test")
    r = s.readers[0]
    ids = r.doc_ids_where(pred)
    with _pytest.raises(ValueError):
        ids[:1] = 0
    # distinct columns= must yield distinct cache identities even with the
    # same explicit key (fn sees different inputs)
    p2 = qx.DocPredicate(lambda t: t.column("doc_id").to_numpy() % 2 == 0,
                         columns=["doc_len"], key="freeze-test")
    assert p2.key != pred.key


def test_near_proximity_matches_brute_force(index_dir, ray_session):
    """[near w ...] == exists one occurrence per term with position span
    <= w, brute-forced from rich positions; Phrase implies Near; parser
    round-trips the syntax."""
    from trinity_ray.query.ast import Near, Phrase, parse_query
    from trinity_ray.search import LocalSearcher

    s = LocalSearcher(index_dir)
    node = parse_query("[near 3 key order]", s.manifest.tokenizer)
    assert node == Near(("KEY", "ORDER"), window=3)

    # brute force from per-doc positions over the AND candidates
    # (ROSETTA/STONE are planted adjacent phrases, so near sets are
    # non-trivial at small windows)
    _res, tbl = s.search_rich("rosetta AND stone", k=0)
    pos_by_doc: dict[int, dict[str, list[int]]] = {}
    for d, t, p in zip(tbl.column("doc_id").to_pylist(),
                       tbl.column("term").to_pylist(),
                       tbl.column("positions").to_pylist()):
        pos_by_doc.setdefault(int(d), {})[t] = list(p)
    nonempty = False
    for w in (0, 1, 2, 3, 7):
        got = sorted(int(d) for d in s.search(Near(("ROSETTA", "STONE"), window=w),
                                              k=0).doc_ids)
        want = sorted(
            d for d, tp in pos_by_doc.items()
            if "ROSETTA" in tp and "STONE" in tp
            and any(abs(a - b) <= w
                    for a in tp["ROSETTA"] for b in tp["STONE"]))
        assert got == want, w
        nonempty = nonempty or bool(got)
    assert nonempty
    # 3-term: span = max-min over one choice per term
    got3 = sorted(int(d) for d in
                  s.search(Near(("ROSETTA", "STONE", "CIPHER"), window=6),
                           k=0).doc_ids)
    _r3, t3 = s.search_rich("rosetta AND stone AND cipher", k=0)
    p3: dict[int, dict[str, list[int]]] = {}
    for d, t, p in zip(t3.column("doc_id").to_pylist(),
                       t3.column("term").to_pylist(),
                       t3.column("positions").to_pylist()):
        p3.setdefault(int(d), {})[t] = list(p)
    want3 = sorted(
        d for d, tp in p3.items()
        if all(t in tp for t in ("ROSETTA", "STONE", "CIPHER"))
        and any(max(a, b, c) - min(a, b, c) <= 6
                for a in tp["ROSETTA"] for b in tp["STONE"]
                for c in tp["CIPHER"]))
    assert got3 == want3 and got3
    # Phrase("ROSETTA","STONE") implies Near(..., 1)
    ph = set(int(d) for d in s.search(Phrase(("ROSETTA", "STONE")),
                                      k=0).doc_ids)
    near1 = set(int(d) for d in s.search(Near(("ROSETTA", "STONE"), window=1),
                                         k=0).doc_ids)
    assert ph and ph <= near1


def test_facet_counts_matches_metadata(tmp_path, ray_session):
    """facet_counts == groupby over the matched docs' metadata column;
    delete masks apply."""
    import pyarrow.parquet as pq2

    from trinity_ray.index.merge import delete_docs
    from trinity_ray.search import LocalSearcher

    langs = ["en", "de", "fr"]
    texts = [("alpha beta" if i % 2 == 0 else "beta gamma")
             for i in range(90)]
    t = pa.table({"text": pa.array(texts),
                  "lang": pa.array([langs[i % 3] for i in range(90)])})
    src = str(tmp_path / "d.parquet")
    pq2.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, content_column="text", id_columns=("lang",),
                tokenizer="simple", positions=True)
    s = LocalSearcher(idx)
    got = dict(s.facet_counts("alpha", "lang"))
    want: dict[str, int] = {}
    for i in range(90):
        if i % 2 == 0:
            want[langs[i % 3]] = want.get(langs[i % 3], 0) + 1
    assert got == want
    # deletes mask facet rows too
    delete_docs(idx, [0, 6], generation=1)
    s2 = LocalSearcher(idx)
    got2 = dict(s2.facet_counts("alpha", "lang"))
    want2 = dict(want)
    want2["en"] -= 2          # docs 0 and 6 are lang=en, match 'alpha'
    assert got2 == want2
    # unknown column raises
    import pytest as _pytest
    with _pytest.raises(KeyError):
        s.facet_counts("alpha", "nope")


def test_ray_facet_counts_matches_local(tmp_path, ray_session):
    """RaySearcher.facet_counts (actor-side partials) == LocalSearcher."""
    import pyarrow.parquet as pq2

    from trinity_ray.search import LocalSearcher, RaySearcher

    langs = ["en", "de", "fr", "es"]
    t = pa.table({
        "text": pa.array([("alpha beta" if i % 2 == 0 else "beta gamma")
                          for i in range(200)]),
        "lang": pa.array([langs[i % 4] for i in range(200)]),
    })
    src = str(tmp_path / "d.parquet")
    pq2.write_table(t, src, row_group_size=50)
    idx = str(tmp_path / "idx")
    build_index(src, idx, content_column="text", id_columns=("lang",),
                tokenizer="simple", positions=True,
                target_rows_per_partition=60)
    local = LocalSearcher(idx).facet_counts("alpha OR gamma", "lang")
    dist = RaySearcher(idx, num_actors=2).facet_counts(
        "alpha OR gamma", "lang")
    assert dist == local and local


def test_snippets_match_refinditer(sf_dir, ray_session):
    """q_search_snippets: each snippet is the +-30-char window around the
    doc's first matched-token offset, recomputed via re.finditer."""
    import re

    from trinity_ray.pipelines import docsearch as dsp

    got = dsp.q_search_snippets(sf_dir)
    docs = pq.read_table(dsp.documents_parquet(sf_dir),
                         columns=["doc_id", "text"])
    texts = dict(zip(docs.column("doc_id").to_pylist(),
                     docs.column("text").to_pylist()))
    pat = re.compile(r"[A-Za-z0-9]+")
    for d, snip in zip(got.column("doc_id").to_pylist(),
                       got.column("snippet").to_pylist()):
        text = texts[d] or ""
        offs = [m.start() for m in pat.finditer(text)
                if m.group().upper() in ("DUP", "VECTOR")]
        assert offs, d
        off = min(offs)
        assert snip == text[max(0, off - 30):off + 30], d


def test_ray_suggest_terms_matches_local(index_dir, ray_session):
    from trinity_ray.search import LocalSearcher, RaySearcher

    local = LocalSearcher(index_dir).suggest_terms("re", k=8)
    dist = RaySearcher(index_dir, num_actors=2).suggest_terms("re", k=8)
    assert dist == local and local


def test_hits_file_split_lazy_io(index_dir, corpus_dir):
    """Format 5 routes positions+payloads to a sibling .hits file
    (lucene_codec.cpp:107-137's separate hits.data): docs-only/BM25
    queries must never open it; positional queries fetch exact ranges
    lazily and still decode correctly."""
    import glob

    bins = glob.glob(os.path.join(index_dir, "segments", "*",
                                  "postings.bin"))
    assert bins, "expected built segments"
    for b in bins:
        h = b[:-len(".bin")] + ".hits"
        assert os.path.exists(h), h
        assert os.path.getsize(h) > 0   # positions=True corpus has hits

    def hits_handles(s):
        return sum(sum(1 for key in r._handles
                       if isinstance(key, tuple) and key[0] == "hits")
                   for r in s.readers)

    s = LocalSearcher(index_dir)
    # a phrase guaranteed to exist: the first two tokens of a real doc
    from trinity_ray.tokenizer import get_tokenizer
    f = sorted(x for x in os.listdir(corpus_dir) if x.endswith(".parquet"))[0]
    text = pq.read_table(os.path.join(corpus_dir, f), columns=["content"]
                         ).column("content")[0].as_py()
    t1, t2 = get_tokenizer("trinity")(text)[:2]
    res = s.search(f"{t1} {t2}", k=10)        # BM25 AND, docs-only
    assert res.doc_ids.size > 0
    assert hits_handles(s) == 0, "BM25 query touched the hits file"
    phr = s.search(f'"{t1} {t2}"', k=10)      # phrase needs positions
    assert hits_handles(s) >= 1
    assert phr.doc_ids.size > 0


def test_match_some_single_present_child_respects_min_match(index_dir):
    """Regression (r5 review): MatchSome(k>=2) where only ONE child has
    postings must return the EMPTY set — the union shortcut for a single
    non-empty part applies only at k == 1.  Also pins k > number of
    non-empty children => empty, and the k == 1 single-part shortcut."""
    s = LocalSearcher(index_dir)
    present = "merge"  # in the corpus vocab
    r2 = s.search(f"[2 {present} zzzmissing qqqmissing]", k=0)
    assert r2.doc_ids.size == 0
    r3 = s.search(f"[3 {present} zzzmissing]", k=0)
    assert r3.doc_ids.size == 0
    r1 = s.search(f"[1 {present} zzzmissing]", k=0)
    base = s.search(present, k=0)
    assert sorted(map(int, r1.doc_ids)) == sorted(map(int, base.doc_ids))


def test_ray_searcher_delete_k_sweep_parity(tmp_path, ray_session):
    """RaySearcher must equal LocalSearcher exactly — doc order AND scores —
    across actor counts, k values (including k=0 full match set), and with
    a delete generation masking part of the corpus."""
    import numpy as np

    from trinity_ray.index.build import build_index
    from trinity_ray.index.merge import delete_docs
    from trinity_ray.search import LocalSearcher, RaySearcher

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta"]
    rng = np.random.default_rng(77177)
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 20)).tolist())
            for _ in range(500)]
    pq.write_table(pa.table({"text": pa.array(docs)}),
                   str(tmp_path / "d.parquet"), row_group_size=100)
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, content_column="text",
                tokenizer="simple", positions=True,
                target_rows_per_partition=150)
    kill = sorted(int(x) for x in rng.choice(500, size=80, replace=False))
    delete_docs(idx, kill, generation=2)
    ls = LocalSearcher(idx)
    queries = ["alpha", "beta OR gamma", "alpha AND delta", '"eps zeta"',
               "eta NOT theta", "[2 alpha beta gamma]", "(alpha <beta>)"]
    for na in (1, 3):
        rs = RaySearcher(idx, num_actors=na)
        for q in queries:
            for k in (1, 37, 0):
                a = ls.search(q, k=k)
                b = rs.search(q, k=k)
                assert list(map(int, a.doc_ids)) == list(map(int, b.doc_ids)), (na, q, k)
                np.testing.assert_allclose(a.scores, b.scores, rtol=1e-12,
                                           err_msg=f"{na} {q} {k}")


def test_hybrid_rerank_changes_pure_bm25_order(ray_session, sf_dir):
    """Hybrid = 0.5*bm25 + 0.5*cosine must (a) draw from the BM25
    candidate set and (b) respect the combined ordering."""
    from trinity_ray.pipelines import docsearch as dsp

    import pyarrow.parquet as pq

    hybrid = dsp.q_hybrid_search_top10(sf_dir).to_pandas()
    res = dsp._searcher(dsp.base_index(sf_dir)).search(
        dsp.DRIVER_QUERIES["and2"], k=50)
    cand = set(int(d) for d in res.doc_ids)
    assert set(hybrid.doc_id) <= cand
    assert len(hybrid) == min(10, len(cand))
    # combined scores are non-increasing with doc_id tie-break
    s = hybrid.score_r.tolist()
    assert all(a >= b for a, b in zip(s, s[1:]))
    # pin the cosine path: recompute 0.5*bm25 + 0.5*cos independently and
    # demand the exact same top-10 (an implementation ignoring the cosine
    # term would pass the subset/ordering checks above)
    emb = pq.read_table(dsp.embeddings_parquet(sf_dir),
                        columns=["vec_id", "embedding"])
    vecs = {int(v): np.asarray(e, np.float64)
            for v, e in zip(emb.column("vec_id").to_pylist(),
                            emb.column("embedding").to_pylist())}
    q = vecs[0] / np.linalg.norm(vecs[0])
    expect = sorted(
        ((-0.5 * sc - 0.5 * float(vecs[int(d)]
                                  @ q / np.linalg.norm(vecs[int(d)])),
          int(d))
         for d, sc in zip(res.doc_ids, res.scores) if int(d) in vecs),
    )[:10]
    assert hybrid.doc_id.tolist() == [d for _, d in expect]
    assert hybrid.score_r.tolist() == [
        float(np.floor(-c * 1e4 + 0.5) / 1e4) for c, _ in expect]


def test_prefix_query_expansion(index_dir, ray_session):
    """[prefix p] search == explicit OR of the dictionary completions at
    weight 1.0 (df-desc cap 16); Local and Ray paths agree; no-completion
    prefixes degrade to the exact term."""
    from trinity_ray.query.ast import And, Or, Prefix, Token, parse_query
    from trinity_ray.search import LocalSearcher, RaySearcher

    s = LocalSearcher(index_dir)
    assert parse_query("[prefix return]", "trinity") == Prefix("RETURN")
    assert parse_query("[prefix ret sta]", "trinity") == \
        And((Prefix("RET"), Prefix("STA")))
    # pick a 2-char prefix with several completions from the dictionary
    probe = None
    for t, _df in sorted(s.readers[0]._iter_terms()):
        if len(t) >= 2 and len(s._prefix_merged(t[:2])) > 1:
            probe = t[:2]
            break
    assert probe is not None, "fixture corpus has no shared 2-char prefix"
    comp = s._prefix_merged(probe)
    alts = sorted(comp.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    manual = Or(tuple(Token(t) for t, _ in alts))
    r_pref = s.search(f"[prefix {probe}]", k=10)
    r_manual = s.search(manual, k=10)
    np.testing.assert_array_equal(r_pref.doc_ids, r_manual.doc_ids)
    np.testing.assert_allclose(r_pref.scores, r_manual.scores)
    # distributed expansion uses merged global df -> identical results
    rs = RaySearcher(index_dir, num_actors=2)
    r_ray = rs.search(f"[prefix {probe}]", k=10)
    np.testing.assert_array_equal(r_pref.doc_ids, r_ray.doc_ids)
    np.testing.assert_allclose(r_pref.scores, r_ray.scores)
    # a prefix matching nothing degrades to the exact (absent) term
    r_none = s.search("[prefix zzzzqqqq]", k=10)
    assert r_none.doc_ids.size == 0
    # mixed with boolean ops: AND restricts like any other leaf
    r_and = s.search(f"[prefix {probe}] AND [prefix zzzzqqqq]", k=10)
    assert r_and.doc_ids.size == 0


def test_more_like_this(ray_session, tmp_path):
    """Seed-doc similarity: term selection = seed-tf/dictionary-df, seed
    excluded, results ranked by the ordinary BM25 OR over chosen terms."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trinity_ray.index.build import build_index
    from trinity_ray.search import LocalSearcher, more_like_this

    docs = [
        "zebra quokka yak zebra zebra quokka",     # seed: bursty rare terms
        "zebra quokka yak in the meadow today",    # shares all three
        "zebra alone in the field tonight maybe",  # shares one
        "completely different words here to see",  # shares none
        "the common filler words appear in every document here",
    ]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)}), str(src))
    idx = tmp_path / "idx"
    build_index(str(src), str(idx), content_column="text",
                tokenizer="simple", positions=True)
    s = LocalSearcher(str(idx))
    res = more_like_this(s, docs[0], k=4, n_terms=3, exclude_doc_id=0)
    assert 0 not in res.doc_ids.astype(np.int64).tolist()   # seed excluded
    ids = res.doc_ids.astype(np.int64).tolist()
    assert ids[0] == 1                       # richest term overlap first
    assert 2 in ids                          # partial overlap matches
    assert 3 not in ids                      # no overlap never matches
    # empty / OOV seeds degrade to empty results, not errors
    assert more_like_this(s, "", k=3).doc_ids.size == 0
    assert more_like_this(s, "xx9zz8qq7", k=3).doc_ids.size == 0
