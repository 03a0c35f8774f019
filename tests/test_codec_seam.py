"""Codec seam + payload channel end-to-end (reference codecs.h:67-317
pluggability, lucene_codec.cpp packed blocks, codecs.h:194-195 payloads):
same index content under either codec must answer every query identically;
per-hit payloads round-trip build -> query and survive merge, including
cross-codec rewrites."""

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.index.merge import delete_docs, merge_index
from trinity_ray.search import LocalSearcher

DOCS = [
    "alpha beta gamma alpha",
    "beta delta",
    "gamma gamma alpha zeta",
    "epsilon",
    "alpha beta beta zeta delta",
    "",
    "zeta alpha",
] * 40  # enough rows for multi-block postings


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("codec_seam")
    pq.write_table(pa.table({"text": pa.array(DOCS)}),
                   os.path.join(str(d), "c.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def indexes(ray_session, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("codec_idx")
    v = str(base / "varint")
    p = str(base / "packed")
    build_index(os.path.join(corpus, "c.parquet"), v, content_column="text",
                tokenizer="simple", codec="varint")
    build_index(os.path.join(corpus, "c.parquet"), p, content_column="text",
                tokenizer="simple", codec="packed")
    return v, p


QUERIES = ["alpha", "alpha AND beta", "alpha OR delta", '"alpha beta"',
           "zeta NOT delta", "[2 alpha beta gamma]", ""]


def test_packed_index_equals_varint(indexes):
    sv = LocalSearcher(indexes[0])
    sp = LocalSearcher(indexes[1])
    for q in QUERIES:
        rv = sv.search(q, k=10)
        rp = sp.search(q, k=10)
        np.testing.assert_array_equal(rv.doc_ids, rp.doc_ids, err_msg=q)
        np.testing.assert_array_equal(rv.scores, rp.scores, err_msg=q)
    # rich hits identical too (positions decode via packed blocks)
    _, tv = sv.search_rich("alpha OR beta", k=10)
    _, tp_ = sp.search_rich("alpha OR beta", k=10)
    assert tv.equals(tp_)


def test_packed_codec_recorded_and_smaller_or_close(indexes):
    import json

    for idx, codec in zip(indexes, ["varint", "packed"]):
        s = LocalSearcher(idx)
        seg = s.manifest.segments[0]
        with open(os.path.join(idx, "segments", seg.name, "stats.json")) as f:
            assert json.load(f)["codec"] == codec
    bin_size = lambda idx: sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(idx) for f in fs if f.endswith(".bin"))
    # packed should be in the same ballpark as varint on this corpus
    assert bin_size(indexes[1]) < 2 * bin_size(indexes[0])


def test_cross_codec_merge(indexes, tmp_path, ray_session):
    """Merging a varint index with output codec 'packed' (and vice versa)
    yields identical query results — the cross-codec rewrite path."""
    v, p = indexes
    out1 = str(tmp_path / "v_to_p")
    merge_index(v, out1, codec="packed")
    s0, s1 = LocalSearcher(v), LocalSearcher(out1)
    for q in QUERIES:
        r0, r1 = s0.search(q, k=10), s1.search(q, k=10)
        np.testing.assert_array_equal(r0.doc_ids, r1.doc_ids, err_msg=q)
        np.testing.assert_array_equal(r0.scores, r1.scores, err_msg=q)
    import json

    seg = s1.manifest.segments[0]
    with open(os.path.join(out1, "segments", seg.name, "stats.json")) as f:
        assert json.load(f)["codec"] == "packed"


@pytest.fixture(scope="module")
def payload_index(ray_session, corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("pay") / "idx")
    build_index(os.path.join(corpus, "c.parquet"), idx, content_column="text",
                tokenizer="simple", payloads="char_offset", codec="packed")
    return idx


def test_payload_char_offsets_end_to_end(payload_index):
    """Rich hits return each hit's char offset; verified against a direct
    regex scan of the source docs."""
    s = LocalSearcher(payload_index)
    res, tbl = s.search_rich("alpha AND zeta", k=5)
    assert "payloads" in tbl.column_names
    df = tbl.to_pandas()
    for _, r in df.iterrows():
        text = DOCS[int(r["doc_id"])]
        expect = [m.start() for m in re.finditer(r"[A-Za-z0-9]+", text)
                  if m.group(0).upper() == r["term"]]
        assert list(r["payloads"]) == expect, (r["term"], r["doc_id"])
        assert len(r["payloads"]) == r["tf"] == len(r["positions"])


def test_payloads_survive_delete_and_merge(payload_index, tmp_path,
                                           ray_session):
    import shutil

    src = str(tmp_path / "src")
    shutil.copytree(payload_index, src)
    s0 = LocalSearcher(src)
    victims = [int(d) for d in s0.search("alpha", k=3).doc_ids]
    delete_docs(src, victims, generation=1)
    merged = str(tmp_path / "merged")
    merge_index(src, merged)
    sm = LocalSearcher(merged)
    res, tbl = sm.search_rich("alpha", k=5)
    df = tbl.to_pandas()
    assert not set(df["doc_id"]) & set(victims)
    assert "payloads" in tbl.column_names
    for _, r in df.iterrows():
        text = DOCS[int(r["doc_id"])]
        expect = [m.start() for m in re.finditer(r"[A-Za-z0-9]+", text)
                  if m.group(0).upper() == r["term"]]
        assert list(r["payloads"]) == expect


def test_positionless_payload_rich_hits(ray_session, corpus, tmp_path):
    """A positionless index can still carry per-hit payloads; rich output
    payload lists come from tf, not the (zero) position lens (review
    finding: they were silently empty)."""
    idx = str(tmp_path / "nopos")
    build_index(os.path.join(corpus, "c.parquet"), idx, content_column="text",
                tokenizer="simple", positions=False, payloads="char_offset")
    s = LocalSearcher(idx)
    res, tbl = s.search_rich("alpha", k=5)
    assert "payloads" in tbl.column_names
    df = tbl.to_pandas()
    for _, r in df.iterrows():
        assert len(r["positions"]) == 0          # positionless index
        assert len(r["payloads"]) == r["tf"] >= 1
        text = DOCS[int(r["doc_id"])]
        expect = [m.start() for m in re.finditer(r"[A-Za-z0-9]+", text)
                  if m.group(0).upper() == r["term"]]
        assert list(r["payloads"]) == expect


def test_trinity_tokenizer_payload_round_trip(ray_session, tmp_path):
    """payloads="char_offset" composes with tokenizer="trinity" (the
    reference's payload channel is tokenizer-agnostic, indexer.h:99-149):
    rich hits carry each hit's char offset, verified against a direct
    TOKEN_RE scan of the source docs."""
    from trinity_ray.tokenizer import trinity_tokenize_spans

    docs = [
        "I.B.M ships C++ code to site:x-box.com again and again",
        "John's C++ parser beats I.B.M parser",
        "d&d night at 9.000 with L'Oreal sponsors",
        "plain words only here",
    ] * 20
    src = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"text": pa.array(docs)}), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, content_column="text", tokenizer="trinity",
                payloads="char_offset")
    s = LocalSearcher(idx)
    res, tbl = s.search_rich("IBM AND parser", k=5)
    assert "payloads" in tbl.column_names
    df = tbl.to_pandas()
    assert len(df)
    for _, r in df.iterrows():
        text = docs[int(r["doc_id"])]
        toks, offs = trinity_tokenize_spans(text)
        expect = [o for t, o in zip(toks, offs) if t == r["term"]]
        assert list(r["payloads"]) == expect, (r["term"], r["doc_id"])
        assert len(r["payloads"]) == r["tf"] == len(r["positions"])


def test_compaction_preserves_payloads(ray_session, corpus, tmp_path):
    """In-place compaction of payload-carrying packed segments keeps the
    per-hit payload channel intact (byte-concat path for v2 + payloads)."""
    from trinity_ray.index.merge import compact_segments, plan_compaction
    from trinity_ray.index.segment import read_manifest

    import pyarrow as pa

    src = str(tmp_path / "payc.parquet")   # small row groups -> multiple
    texts = pq.read_table(os.path.join(corpus, "c.parquet")   # partitions
                          ).column("text").to_pylist()
    pq.write_table(pa.table({"text": pa.array(texts)}), src, row_group_size=32)
    idx = str(tmp_path / "payc")
    build_index(src, idx, content_column="text",
                tokenizer="simple", payloads="char_offset", codec="packed",
                target_rows_per_partition=64)
    s0 = LocalSearcher(idx)
    _res0, tbl0 = s0.search_rich("alpha OR beta", k=20)
    assert tbl0.num_rows > 0
    pay_col = next(c for c in tbl0.column_names if "payload" in c)
    assert any(len(p) for p in tbl0.column(pay_col).to_pylist())
    man = read_manifest(idx)
    assert len(man.segments) >= 2, "fixture must produce multiple segments"
    compact_segments(idx, [s.name for s in man.segments])
    s1 = LocalSearcher(idx)
    _res1, tbl1 = s1.search_rich("alpha OR beta", k=20)
    key = [("doc_id", "ascending"), ("term", "ascending")]
    assert tbl0.sort_by(key).equals(tbl1.sort_by(key))
