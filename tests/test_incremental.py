"""Incremental lifecycle regressions: multi-generation builds keep older
segments, plan changes invalidate checkpoints, merged indexes re-merge."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.index.merge import delete_docs, merge_index
from trinity_ray.search import LocalSearcher


def _write(tmp, name, docs, row_group_size=None):
    path = str(tmp / name)
    kw = {"row_group_size": row_group_size} if row_group_size else {}
    pq.write_table(pa.table({"text": docs}), path, **kw)
    return path


def test_incremental_generation_appends(tmp_path, ray_session):
    """A gen-1 build into an existing index keeps gen-0 segments AND the
    deletes segment (build/delete manifest semantics are symmetric)."""
    docs0 = ["aa bb", "bb cc", "cc aa", "dd"]
    docs1 = ["ee ff", "ff aa"]
    p0 = _write(tmp_path, "d0.parquet", docs0)
    p1 = _write(tmp_path, "d1.parquet", docs1)
    idx = str(tmp_path / "idx")
    build_index(p0, idx, content_column="text", tokenizer="simple",
                generation=0)
    delete_docs(idx, [3], generation=1)          # delete "dd"
    build_index(p1, idx, content_column="text", tokenizer="simple",
                generation=2)
    s = LocalSearcher(idx)
    gens = sorted({seg.generation for seg in s.manifest.segments})
    assert gens == [0, 1, 2]
    assert any(seg.has_deletes for seg in s.manifest.segments)
    # append offsets docIDs above every prior generation — no collisions
    g2 = [seg for seg in s.manifest.segments if seg.generation == 2]
    assert min(seg.doc_base for seg in g2) >= len(docs0)
    res = s.search("", k=0)  # MatchAll over live docs
    ids = [int(d) for d in res.doc_ids]
    assert len(ids) == len(set(ids)) == len(docs0) - 1 + len(docs1)
    # "aa" appears in docs 0, 2 and appended doc (base+1)
    aa = sorted(int(d) for d in s.search("aa", k=0).doc_ids)
    assert aa == [0, 2, g2[0].doc_base + 1]


def test_tokenizer_change_rejected(tmp_path, ray_session):
    p = _write(tmp_path, "d.parquet", ["aa bb"])
    idx = str(tmp_path / "idx")
    build_index(p, idx, content_column="text", tokenizer="simple")
    with pytest.raises(ValueError, match="tokenizer"):
        build_index(p, idx, content_column="text", tokenizer="trinity",
                    generation=1)


def test_plan_change_invalidates_checkpoint(tmp_path, ray_session):
    """Rebuilding with a different partition plan must NOT resume segments
    whose docID ranges no longer match the spec."""
    docs = [f"word{i % 7} tok{i % 3}" for i in range(400)]
    p = _write(tmp_path, "d.parquet", docs, row_group_size=50)
    idx = str(tmp_path / "idx")
    build_index(p, idx, content_column="text", tokenizer="simple",
                target_rows_per_partition=100)
    # p00000 now covers docs [0,100); rebuild with 200-doc partitions:
    # p00000 must cover [0,200) — the old checkpoint is stale
    m2 = build_index(p, idx, content_column="text", tokenizer="simple",
                     target_rows_per_partition=200)
    seg0 = [s for s in m2.segments if s.part_id == 0][0]
    assert seg0.doc_count == 200
    s = LocalSearcher(idx)
    assert s.search("", k=0).doc_ids.size == len(docs)


def test_remerge_of_merged_index(tmp_path, ray_session):
    """merge -> delete -> merge again: sharded docs/ dirs are valid inputs."""
    docs = [f"alpha{i % 5} beta{i % 3}" for i in range(120)]
    p = _write(tmp_path, "d.parquet", docs, row_group_size=30)
    idx = str(tmp_path / "idx")
    build_index(p, idx, content_column="text", tokenizer="simple",
                target_rows_per_partition=30)
    m1 = str(tmp_path / "m1")
    merge_index(idx, m1)
    delete_docs(m1, [0, 1, 2], generation=5)
    m2 = str(tmp_path / "m2")
    out = merge_index(m1, m2)
    assert out.total_stats().docs_cnt == len(docs) - 3
    s = LocalSearcher(m2)
    ids = set(int(d) for d in s.search("", k=0).doc_ids)
    assert ids == set(range(3, len(docs)))


def test_replace_semantics_last_writer_wins(tmp_path, ray_session):
    """build_index(replace_docs=True) at a newer generation: same docIDs
    mask older generations (SegmentIndexSession::replace, indexer.h:181-206),
    and a merge applies the replacement physically."""
    old = ["old aa", "old bb", "keep cc", "keep dd"]
    new = ["new aa", "new bb"]  # replaces docs 0 and 1
    p_old = _write(tmp_path, "old.parquet", old)
    p_new = _write(tmp_path, "new.parquet", new)
    idx = str(tmp_path / "idx")
    build_index(p_old, idx, content_column="text", tokenizer="simple",
                generation=0)
    build_index(p_new, idx, content_column="text", tokenizer="simple",
                generation=1, replace_docs=True)
    s = LocalSearcher(idx)
    # OLD matches only surviving (non-replaced) docs... none contain OLD now
    assert set(int(d) for d in s.search("old", k=0, scorer="bm25").doc_ids) == set()
    assert set(int(d) for d in s.search("new", k=0).doc_ids) == {0, 1}
    assert set(int(d) for d in s.search("keep", k=0).doc_ids) == {2, 3}
    # merged: physical replacement, stats over live docs
    merged = str(tmp_path / "merged")
    m = merge_index(idx, merged)
    assert m.total_stats().docs_cnt == 4
    sm = LocalSearcher(merged)
    assert set(int(d) for d in sm.search("new", k=0).doc_ids) == {0, 1}
    assert sm.search("old", k=0).doc_ids.size == 0


def test_interrupted_build_resume_byte_identical(tmp_path, ray_session):
    """Simulated mid-build failure: removing arbitrary segment dirs and
    rerunning rebuilds ONLY those partitions, byte-identical to the
    uninterrupted build (north-rule checkpoint/resume)."""
    import json
    import shutil

    from tests.test_flush_runs import postings_of

    docs = [f"alpha{i % 11} beta{i % 5} gamma{i % 3}" for i in range(600)]
    p = _write(tmp_path, "d.parquet", docs, row_group_size=100)
    idx = str(tmp_path / "idx")
    build_index(p, idx, content_column="text", tokenizer="simple",
                target_rows_per_partition=100)
    reference = postings_of(idx)
    # "crash": two segments vanish mid-build
    segs = sorted((tmp_path / "idx" / "segments").iterdir())
    shutil.rmtree(segs[1])
    shutil.rmtree(segs[4])
    m = build_index(p, idx, content_column="text", tokenizer="simple",
                    target_rows_per_partition=100)
    assert postings_of(idx) == reference
    metrics = json.load(open(str(tmp_path / "idx" / "build_metrics.json")))
    assert metrics["totals"]["built_partitions"] == 2
    assert metrics["totals"]["resumed_partitions"] == len(segs) - 2
    s = LocalSearcher(idx)
    assert s.search("", k=0).doc_ids.size == len(docs)
