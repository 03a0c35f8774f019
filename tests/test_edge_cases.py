"""Edge-case builds: empty text, all-deleted corpora, unicode content."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from trinity_ray.index.build import build_index
from trinity_ray.index.merge import delete_docs, merge_index
from trinity_ray.oracle import OracleIndex
from trinity_ray.search import LocalSearcher


def test_empty_and_whitespace_docs(tmp_path, ray_session):
    docs = ["", "   ", "one real doc", "", "another doc here"]
    pq.write_table(pa.table({"text": docs}), str(tmp_path / "d.parquet"))
    idx = str(tmp_path / "idx")
    m = build_index(str(tmp_path / "d.parquet"), idx, content_column="text",
                    tokenizer="simple")
    assert m.total_stats().docs_cnt == 5  # token-less docs still count in N
    s = LocalSearcher(idx)
    res = s.search("doc", k=10)
    assert sorted(int(d) for d in res.doc_ids) == [2, 4]


def test_unicode_content_parity(tmp_path, ray_session):
    """Non-ASCII text takes the per-token path; engine == oracle."""
    docs = ["naïve café straße test", "test straße", "ascii only test",
            "ß alone", "mixed café test"]
    pq.write_table(pa.table({"text": docs}), str(tmp_path / "d.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, content_column="text",
                tokenizer="trinity")
    o = OracleIndex("trinity")
    for i, d in enumerate(docs):
        o.add(i, d)
    s = LocalSearcher(idx)
    for q in ["test", "cafe", "ascii test"]:
        got = s.search(q, k=10)
        want = o.search(q, k=10)
        assert [int(d) for d in got.doc_ids] == [d for d, _ in want], q
        np.testing.assert_allclose(got.scores, [x for _, x in want], rtol=1e-12)


def test_all_docs_deleted_then_merged(tmp_path, ray_session):
    docs = ["aa bb", "bb cc", "cc dd"]
    pq.write_table(pa.table({"text": docs}), str(tmp_path / "d.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, content_column="text",
                tokenizer="simple")
    delete_docs(idx, [0, 1, 2], generation=1)
    s = LocalSearcher(idx)
    assert s.search("bb", k=10).doc_ids.size == 0
    merged = str(tmp_path / "merged")
    m = merge_index(idx, merged)
    assert m.total_stats().docs_cnt == 0
    assert LocalSearcher(merged).search("bb", k=10).doc_ids.size == 0
