"""NRT in-memory index source (index_source.h:11-13 seam): fresh documents
are searchable immediately, deletes mask both live and durable docs, a
flush makes the buffer durable through the ordinary build path, and
results always equal an equivalent durable index."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.index.live import LiveIndex
from trinity_ray.search import LocalSearcher

BASE_DOCS = ["aa bb cc", "bb dd", "cc aa", "ee ff", "aa"]
LIVE_DOCS = ["aa zz", "zz yy", "bb cc aa"]


def _write(tmp, name, docs):
    p = os.path.join(str(tmp), name)
    pq.write_table(pa.table({"text": pa.array(docs)}), p)
    return p


def _equiv_index(tmp_path, docs, name="equiv"):
    p = _write(tmp_path, f"{name}.parquet", docs)
    idx = str(tmp_path / name)
    build_index(p, idx, content_column="text", tokenizer="simple")
    return LocalSearcher(idx)


def test_memory_only_live_index():
    """No Ray, no disk: docs searchable the moment they're added."""
    li = LiveIndex(tokenizer="simple")
    ids = li.add_documents(LIVE_DOCS)
    np.testing.assert_array_equal(ids, [0, 1, 2])
    s = li.searcher()
    assert sorted(int(d) for d in s.search("zz", k=0).doc_ids) == [0, 1]
    assert sorted(int(d) for d in s.search("aa AND cc", k=0).doc_ids) == [2]
    # phrase + rich hits work through the same execution paths
    assert [int(d) for d in s.search('"bb cc"', k=0).doc_ids] == [2]
    res, tbl = s.search_rich("aa", k=5)
    df = tbl.to_pandas()
    assert set(df["doc_id"]) == {0, 2}
    # incremental adds are visible without rebuilding earlier state
    li.add_documents(["qq"])
    assert [int(d) for d in li.searcher().search("qq", k=0).doc_ids] == [3]


def test_live_equals_durable(tmp_path, ray_session):
    """Scores/ranks from a base+live NRT view equal a from-scratch durable
    index over the same docs (global df, never partial idf)."""
    p = _write(tmp_path, "base.parquet", BASE_DOCS)
    base = str(tmp_path / "base")
    build_index(p, base, content_column="text", tokenizer="simple")
    li = LiveIndex(base)
    ids = li.add_documents(LIVE_DOCS)
    np.testing.assert_array_equal(ids, [5, 6, 7])
    s = li.searcher()
    ref = _equiv_index(tmp_path, BASE_DOCS + LIVE_DOCS)
    for q in ["aa", "zz", "aa AND cc", "aa OR zz", '"bb cc"', ""]:
        a = s.search(q, k=10)
        b = ref.search(q, k=10)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids, err_msg=q)
        np.testing.assert_array_equal(a.scores, b.scores, err_msg=q)


def test_live_deletes_mask_everywhere(tmp_path, ray_session):
    p = _write(tmp_path, "base.parquet", BASE_DOCS)
    base = str(tmp_path / "base")
    build_index(p, base, content_column="text", tokenizer="simple")
    li = LiveIndex(base)
    li.add_documents(LIVE_DOCS)
    li.delete_documents([0, 5])  # one durable, one live
    s = li.searcher()
    ids = set(int(d) for d in s.search("aa", k=0).doc_ids)
    assert ids == {2, 4, 7}
    # stats untouched by masks (same as delete segments): n_docs counts all
    assert s.n_docs == len(BASE_DOCS) + len(LIVE_DOCS)


def test_flush_makes_buffer_durable(tmp_path, ray_session):
    p = _write(tmp_path, "base.parquet", BASE_DOCS)
    base = str(tmp_path / "base")
    build_index(p, base, content_column="text", tokenizer="simple")
    li = LiveIndex(base)
    li.add_documents(LIVE_DOCS)
    li.delete_documents([1, 6])
    li.flush()
    assert li._texts == [] and not li._deleted
    # durable index now answers identically to the pre-flush NRT view
    s = LocalSearcher(base)
    assert sorted(int(d) for d in s.search("zz", k=0).doc_ids) == [5]
    ids = set(int(d) for d in s.search("", k=0).doc_ids)
    assert ids == {0, 2, 3, 4, 5, 7}
    # and the LiveIndex keeps working on top of the flushed state
    li.add_documents(["zz ww"])
    s2 = li.searcher()
    assert sorted(int(d) for d in s2.search("zz", k=0).doc_ids) == [5, 8]


def test_live_tokenizer_mismatch_rejected(tmp_path, ray_session):
    p = _write(tmp_path, "base.parquet", BASE_DOCS)
    base = str(tmp_path / "base")
    build_index(p, base, content_column="text", tokenizer="simple")
    with pytest.raises(ValueError, match="tokenizer"):
        LiveIndex(base, tokenizer="trinity")


def test_flush_target_restrictions(tmp_path, ray_session):
    """flush() must refuse targets whose id space the buffer doesn't
    extend: a different dir than the base, or an existing index for a
    baseless buffer (review finding: deletes would apply unrebased)."""
    p = _write(tmp_path, "base.parquet", BASE_DOCS)
    base = str(tmp_path / "base")
    build_index(p, base, content_column="text", tokenizer="simple")
    li = LiveIndex(base)
    li.add_documents(["zz"])
    with pytest.raises(ValueError, match="flush target must be the base"):
        li.flush(str(tmp_path / "elsewhere"))
    li2 = LiveIndex(tokenizer="simple")
    li2.add_documents(["aa"])
    with pytest.raises(ValueError, match="FRESH directory"):
        li2.flush(base)
    # fresh-dir flush of a baseless buffer works
    fresh = str(tmp_path / "fresh")
    li2.flush(fresh)
    assert [int(d) for d in LocalSearcher(fresh).search("aa", k=0).doc_ids] \
        == [0]


def test_live_multi_shard_ingest_and_fanout(ray_session, tmp_path):
    """The documented scale shape (live.py module docstring): one LiveIndex
    per ingest ACTOR over its shard of the stream; search fans out across
    actors like RaySearcher over segments, with GLOBAL df across live +
    durable docs.  Results equal a single LiveIndex ingesting everything
    (VERDICT r2 next-#8)."""
    import ray

    from trinity_ray.query.ast import (
        collect_scorable_weights,
        collect_terms,
        parse_query,
    )
    from trinity_ray.query.scorers import get_scorer
    from trinity_ray.search import merge_topk

    docs = [f"alpha beta {'gamma' if i % 3 == 0 else 'delta'} tok{i % 7}"
            for i in range(200)]
    # durable base over docs[:60]; shard 0 = base + live docs[60:100],
    # shard 1 = baseless live docs[100:200] at id offset 100
    base_src = _write(tmp_path, "base.parquet", docs[:60])
    base_idx = str(tmp_path / "base_idx")
    build_index(base_src, base_idx, content_column="text", tokenizer="simple")

    @ray.remote
    class IngestWorker:
        def __init__(self, base_dir, id_offset):
            self.offset = np.uint64(id_offset)
            self.live = LiveIndex(base_dir) if base_dir else LiveIndex()

        def add(self, texts):
            self.live.add_documents(texts)

        def stats(self, terms):
            s = self.live.searcher()
            df = {t: 0 for t in terms}
            for r in s.readers:
                for t, d in r.lookup_terms(terms).items():
                    df[t] += d
            return df, s.n_docs

        def execute(self, query, idf, k):
            s = self.live.searcher()
            node = parse_query(query, "simple")
            parts = [r.execute(node, idf, k) for r in s.readers]
            parts = [p for p in parts if p[0].size]
            m = merge_topk(parts, k)
            return m.doc_ids + self.offset, m.scores

    workers = [IngestWorker.remote(base_idx, 0),
               IngestWorker.remote(None, 100)]
    ray.get([workers[0].add.remote(docs[60:100]),
             workers[1].add.remote(docs[100:200])])
    for query in ("alpha AND gamma", "beta", "delta OR tok3", '"alpha beta"'):
        node = parse_query(query, "simple")
        terms = collect_terms(node)
        stats = ray.get([w.stats.remote(terms) for w in workers])
        df = {t: sum(s[0][t] for s in stats) for t in terms}
        n = sum(s[1] for s in stats)
        assert n == 200
        sc = get_scorer("bm25")
        wmul = collect_scorable_weights(node)
        idf = {t: sc.weight(float(df[t]), n) * w
               for t, w in wmul.items() if df[t] > 0}
        parts = ray.get([w.execute.remote(query, idf, 10) for w in workers])
        got = merge_topk([p for p in parts if p[0].size], 10)
        ref = LiveIndex()
        ref.add_documents(docs)
        want = ref.searcher().search(query, k=10)
        np.testing.assert_array_equal(got.doc_ids, want.doc_ids), query
        np.testing.assert_allclose(got.scores, want.scores, rtol=0, atol=0)


def test_live_metadata_facets_and_predicates(ray_session, tmp_path):
    """App-field metadata on live docs: facet_counts and DocPredicate see
    RAM docs exactly like durable ones, and the fields survive flush."""
    from trinity_ray.index.live import LiveIndex
    from trinity_ray.query.exec import DocPredicate

    live = LiveIndex(None, tokenizer="simple", positions=True)
    live.add_documents(["alpha beta", "alpha gamma"],
                       metadata={"lang": ["en", "de"]})
    live.add_documents(["alpha delta"], metadata={"lang": ["en"]})
    s = live.searcher()
    assert s.facet_counts("alpha", "lang") == [("en", 2), ("de", 1)]
    # metadata predicate on RAM docs
    pred = DocPredicate(
        lambda t: np.asarray([v == "en" for v in
                              t.column("lang").to_pylist()]),
        columns=["lang"], key="lang-en")
    r = s.search("alpha", k=0, doc_predicate=pred)
    assert sorted(int(d) for d in r.doc_ids) == [0, 2]
    # column-set consistency is enforced
    with pytest.raises(ValueError, match="metadata columns"):
        live.add_documents(["x"], metadata={"other": ["y"]})
    with pytest.raises(ValueError, match="has 2 values"):
        LiveIndex(None, tokenizer="simple").add_documents(
            ["a"], metadata={"lang": ["en", "de"]})
    # flush: fields land in docs metadata; facet still answers
    idx = str(tmp_path / "idx")
    live.flush(idx)
    from trinity_ray.search import LocalSearcher
    s2 = LocalSearcher(idx)
    assert s2.facet_counts("alpha", "lang") == [("en", 2), ("de", 1)]
    # and the NRT buffer keeps working on top with the same columns
    live.add_documents(["alpha zeta"], metadata={"lang": ["fr"]})
    s3 = live.searcher()
    assert s3.facet_counts("alpha", "lang") == \
        [("en", 2), ("de", 1), ("fr", 1)]


def test_live_metadata_schema_locked_to_base(ray_session, tmp_path):
    """A durable base fixes the app-field schema: a buffer over a base
    built with ('lang',) must supply lang; reserved names are rejected."""
    from trinity_ray.index.live import LiveIndex

    idx = str(tmp_path / "idx")
    live = LiveIndex(None, tokenizer="simple")
    live.add_documents(["alpha beta"], metadata={"lang": ["en"]})
    live.flush(idx)
    live2 = LiveIndex(idx, tokenizer="simple")
    with pytest.raises(ValueError, match="base index app fields"):
        live2.add_documents(["no metadata"])
    live2.add_documents(["gamma delta"], metadata={"lang": ["fr"]})
    s = live2.searcher()
    assert dict(s.facet_counts("alpha OR gamma", "lang")) == \
        {"en": 1, "fr": 1}
    with pytest.raises(ValueError, match="collide with core"):
        LiveIndex(None, tokenizer="simple").add_documents(
            ["x"], metadata={"text": ["junk"]})
