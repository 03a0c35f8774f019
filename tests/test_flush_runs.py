"""Bounded-flush builds (intermediateStateFlushFreq analogue,
indexer.cpp:134-152): a partition built through multiple flush runs must
produce postings byte-identical to a single-run build."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.search import LocalSearcher


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("flush")
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(150)] + ["hot"] * 5
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 40)).tolist())
            for _ in range(1200)]
    path = str(tmp / "docs.parquet")
    pq.write_table(pa.table({"text": docs}), path, row_group_size=300)
    return path


def postings_of(index_dir: str) -> dict[str, tuple[int, bytes]]:
    from trinity_ray.index.segment import segment_postings_files

    out = {}
    segs = os.path.join(index_dir, "segments")
    for seg in sorted(os.listdir(segs)):
        for terms_path, bin_path in segment_postings_files(
                os.path.join(segs, seg)):
            t = pq.read_table(terms_path)
            raw = open(bin_path, "rb").read()
            for term, df, off, ln in zip(t.column("term").to_pylist(),
                                         t.column("df").to_pylist(),
                                         t.column("off").to_pylist(),
                                         t.column("len").to_pylist()):
                out[(seg, term)] = (df, raw[off:off + ln])
    return out


@pytest.mark.parametrize("positions", [True, False])
def test_flushed_build_is_byte_identical(corpus_file, tmp_path, ray_session,
                                         positions):
    one = str(tmp_path / f"one-{positions}")
    many = str(tmp_path / f"many-{positions}")
    build_index(corpus_file, one, content_column="text", tokenizer="simple",
                positions=positions)
    # ~25k hits per run boundary -> several runs per 1200-doc partition
    build_index(corpus_file, many, content_column="text", tokenizer="simple",
                positions=positions, flush_hits=5000, read_batch_rows=128)
    import json

    stats = json.load(open(os.path.join(
        many, "segments", sorted(os.listdir(os.path.join(many, "segments")))[0],
        "stats.json")))
    assert stats["flush_runs"] > 1, "flush threshold never hit"
    assert postings_of(one) == postings_of(many)


def test_flushed_build_query_parity(corpus_file, tmp_path, ray_session):
    idx = str(tmp_path / "flq")
    build_index(corpus_file, idx, content_column="text", tokenizer="simple",
                positions=True, flush_hits=4000, read_batch_rows=128)
    ref = str(tmp_path / "flq-ref")
    build_index(corpus_file, ref, content_column="text", tokenizer="simple",
                positions=True)
    a, b = LocalSearcher(idx), LocalSearcher(ref)
    for q in ["hot", "w3 OR w4", "w1 w2", '"w5 w6"', "hot NOT w9"]:
        ra, rb = a.search(q, k=10), b.search(q, k=10)
        np.testing.assert_array_equal(ra.doc_ids, rb.doc_ids)
        np.testing.assert_array_equal(ra.scores, rb.scores)
