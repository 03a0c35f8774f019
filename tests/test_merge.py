"""Merge & delete tests (SURVEY.md §5 item 4): segments with overlapping
terms + delete masks -> merged index equals rebuild-from-scratch on live
docs (newest-generation-wins, merge.cpp:333 / index_source.h:199-207)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from trinity_ray.fixtures import REFERENCE_QUERIES, write_corpus
from trinity_ray.index.build import build_index
from trinity_ray.index.merge import delete_docs, merge_index
from trinity_ray.search import LocalSearcher

N_DOCS = 600
DELETED = [3, 17, 100, 101, 102, 250, 555, 599]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus_m")
    write_corpus(str(d), N_DOCS, n_files=2, seed=7, row_group_size=128)
    return str(d)


@pytest.fixture(scope="module")
def dirs(ray_session, corpus_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    idx = str(base / "idx")
    merged = str(base / "merged")
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=150)
    delete_docs(idx, DELETED, generation=1)
    merge_index(idx, merged)
    return idx, merged


def test_masking_before_merge(dirs):
    idx, _ = dirs
    s = LocalSearcher(idx)
    res = s.search("", k=0)  # MatchAll over live docs
    ids = set(int(d) for d in res.doc_ids)
    assert ids.isdisjoint(DELETED)
    assert len(ids) == N_DOCS - len(DELETED)


def test_merge_equals_rebuild_on_live_docs(dirs, corpus_dir, tmp_path_factory):
    """The canonical invariant: merged == rebuilt from live docs only."""
    import pyarrow as pa

    idx, merged = dirs
    # rebuild: corpus minus deleted rows (doc ids are global row numbers)
    rebuild_corpus = tmp_path_factory.mktemp("rebuild_corpus")
    row = 0
    tables = []
    for f in sorted(os.listdir(corpus_dir)):
        t = pq.read_table(os.path.join(corpus_dir, f))
        keep = [i for i in range(len(t)) if (row + i) not in DELETED]
        tables.append(t.take(keep))
        row += len(t)
    pq.write_table(pa.concat_tables(tables), os.path.join(str(rebuild_corpus), "all.parquet"))
    rebuilt_dir = str(tmp_path_factory.mktemp("rebuilt_idx"))
    build_index(os.path.join(str(rebuild_corpus), "all.parquet"), rebuilt_dir,
                id_columns=("repo", "path"), target_rows_per_partition=10_000)

    sm = LocalSearcher(merged)
    sr = LocalSearcher(rebuilt_dir)
    assert int(sm.n_docs) == int(sr.n_docs) == N_DOCS - len(DELETED)
    for _, _, text in REFERENCE_QUERIES:
        rm = sm.search(text, k=0)
        rr = sr.search(text, k=0)
        # doc ids differ (rebuild renumbers) -> compare counts and score
        # multisets; plus exact id mapping via position in the live ordering
        assert rm.doc_ids.size == rr.doc_ids.size, text
        np.testing.assert_allclose(np.sort(rm.scores), np.sort(rr.scores),
                                   rtol=1e-12, atol=1e-15, err_msg=text)


def test_merged_topk_matches_masked_topk(dirs):
    """Query results before (mask) and after (physical) merge agree on doc
    sets; scores agree too because pre-merge global stats still count
    deleted docs only in df of segments... they don't: stats are summed
    from build-time segments. So compare doc id SETS only (the reference
    has the same property: masking filters docs, merge rewrites stats)."""
    idx, merged = dirs
    si, sm = LocalSearcher(idx), LocalSearcher(merged)
    for _, _, text in REFERENCE_QUERIES:
        ri = si.search(text, k=0)
        rm = sm.search(text, k=0)
        assert sorted(int(d) for d in ri.doc_ids) == sorted(int(d) for d in rm.doc_ids), text


def test_merged_phrase_and_positions(dirs):
    _, merged = dirs
    s = LocalSearcher(merged)
    r = s.search('"rosetta stone cipher"', k=0)
    assert r.doc_ids.size > 0  # planted phrase present in live docs


def test_merged_segment_layout(dirs):
    _, merged = dirs
    s = LocalSearcher(merged)
    assert len(s.manifest.segments) == 1
    seg = s.manifest.segments[0]
    assert seg.stats.docs_cnt == N_DOCS - len(DELETED)
    postings_dir = os.path.join(merged, "segments", seg.name, "postings")
    assert os.path.isdir(postings_dir)
    # dictionary/bin pairs; terms sorted within each dictionary shard
    from trinity_ray.index.segment import segment_postings_files

    pairs = segment_postings_files(os.path.join(merged, "segments", seg.name))
    assert pairs, "no terms/bin shards written"
    for terms_path, bin_path in pairs:
        assert os.path.exists(bin_path)
        t = pq.read_table(terms_path, columns=["term", "off", "len"])
        terms = t.column("term").to_pylist()
        assert terms == sorted(terms)
        offs = t.column("off").to_pylist()
        lens = t.column("len").to_pylist()
        assert offs == sorted(offs)  # blobs laid out in dictionary order
        assert os.path.getsize(bin_path) == (offs[-1] + lens[-1] if offs else 0)


def test_retire_superseded(dirs):
    """consider_tracked_sources analogue: old segment dirs are GC'd once the
    merged manifest is durable (merge.cpp:418-447)."""
    import shutil

    from trinity_ray.index.merge import retire_superseded

    src, merged = dirs
    clone = src + "-clone"
    shutil.rmtree(clone, ignore_errors=True)
    shutil.copytree(src, clone)
    removed = retire_superseded(clone, merged)
    assert removed
    assert not os.listdir(os.path.join(clone, "segments"))
    assert os.path.exists(os.path.join(clone, "RETIRED.json"))
    # merged index still fully queryable (MatchAll over live docs)
    s = LocalSearcher(merged)
    assert s.search("", k=0).doc_ids.size == N_DOCS - len(DELETED)


def test_merge_rerun_is_idempotent(dirs, tmp_path):
    """A rerun into the same out_dir must not duplicate term shards."""
    idx, merged = dirs
    before = LocalSearcher(merged).search("", k=0).doc_ids.size
    m2 = merge_index(idx, merged)  # complete: returned as-is
    assert len(m2.segments) == 1
    s = LocalSearcher(merged)
    assert s.search("", k=0).doc_ids.size == before
    # terms not duplicated: every df <= live doc count
    r = s.readers[0]
    r._ensure_dict()
    assert all(v[0] <= before for v in r._dict.values())


def test_lazy_probe_finds_boundary_shard_terms(dirs, monkeypatch):
    """Regression: a merged segment's 'boundary' shard spans the whole term
    space, so row-group [min,max] ranges OVERLAP — the lazy probe must check
    every candidate range, not only the bisect hit, or boundary terms
    silently resolve to df=0 (ADVICE r1, high)."""
    import trinity_ray.query.exec as qe
    from trinity_ray.index.segment import segment_postings_files

    _, merged = dirs
    s_eager = LocalSearcher(merged)
    seg_path = os.path.join(merged, "segments",
                            s_eager.manifest.segments[0].name)
    pairs = segment_postings_files(seg_path)
    bpairs = [p for p in pairs if "boundary" in os.path.basename(p[0])]
    assert bpairs, "merged segment has no boundary shard in this fixture"
    bterms = pq.read_table(bpairs[0][0], columns=["term"]
                           ).column("term").to_pylist()
    monkeypatch.setattr(qe, "_EAGER_DICT_MAX", 0)  # force lazy probing
    s_lazy = LocalSearcher(merged)
    r = s_lazy.readers[0]
    r._ensure_dict()
    assert r._dict is None and r._rg_index
    for t in bterms:
        got = r._probe(t)
        assert got is not None, f"boundary term {t!r} dropped by lazy probe"
        # df must agree with the eager dictionary
        assert got[0] == s_eager.readers[0]._probe(t)[0]
    # end-to-end: a query on a boundary term returns identical top-k
    q = bterms[0]
    res_e = s_eager.search(q, k=10)
    res_l = s_lazy.search(q, k=10)
    np.testing.assert_array_equal(res_e.doc_ids, res_l.doc_ids)
    np.testing.assert_array_equal(res_e.scores, res_l.scores)


def test_merge_redone_after_late_deletes(dirs, tmp_path):
    """Deletes added to the source AFTER a completed merge (at or below the
    merged generation) must trigger a re-merge on rerun, not return stale
    output; the superseded segment dir is removed (ADVICE r1)."""
    import shutil

    idx, merged = dirs
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    shutil.copytree(idx, src)
    merge_index(src, out)
    live0 = LocalSearcher(out).search("", k=0).doc_ids.size
    extra = [5, 6, 7]
    delete_docs(src, extra, generation=1)  # same max generation as before
    m2 = merge_index(src, out)             # must redo, not early-return
    s = LocalSearcher(out)
    ids = set(int(d) for d in s.search("", k=0).doc_ids)
    assert ids.isdisjoint(extra)
    assert len(ids) == live0 - len(set(extra) - set(DELETED))
    # no orphaned segment dirs left behind
    keep = {seg.name for seg in m2.segments}
    assert set(os.listdir(os.path.join(out, "segments"))) == keep
    # and an unchanged rerun is still an idempotent no-op (early return)
    v = m2.version
    assert merge_index(src, out).version == v


def test_rich_match_on_masked_and_merged(dirs):
    """Rich hits respect delete masks (stale segments contribute nothing)
    and survive the merge: masked-source output == merged-index output."""
    idx, merged = dirs
    si, sm = LocalSearcher(idx), LocalSearcher(merged)
    res_i, tbl_i = si.search_rich("key AND order", k=10)
    res_m, tbl_m = sm.search_rich("key AND order", k=10)
    np.testing.assert_array_equal(res_i.doc_ids, res_m.doc_ids)
    di = tbl_i.to_pandas().sort_values(["rank", "term"]).reset_index(drop=True)
    dm = tbl_m.to_pandas().sort_values(["rank", "term"]).reset_index(drop=True)
    assert di["doc_id"].tolist() == dm["doc_id"].tolist()
    assert di["tf"].tolist() == dm["tf"].tolist()
    assert [list(p) for p in di["positions"]] == \
           [list(p) for p in dm["positions"]]
    assert not set(di["doc_id"]) & set(DELETED)


def test_concat_u32_guard_routes_megaterm_to_decode():
    """A merged mega-term whose summed header fields would overflow the u32
    blob format must make concat_encoded_many return None (routing the
    whole group to the decode path) BEFORE any stream allocation — forged
    near-max headers stand in for the multi-billion-row term that cannot
    be synthesized (VERDICT r2 next-#7)."""
    import struct

    from trinity_ray.codec import concat_encoded_many, encode_postings

    def blob(base):
        ids = np.arange(base, base + 50, dtype=np.uint64)
        freqs = np.ones(50, dtype=np.uint32)
        pos = np.ones(50, dtype=np.uint32)
        return encode_postings(ids, freqs, pos)

    b1, b2 = blob(0), blob(1000)
    cat = np.frombuffer(b1 + b2, dtype=np.uint8)
    off = np.array([0, len(b1)], dtype=np.int64)
    lens = np.array([len(b1), len(b2)], dtype=np.int64)
    rows = np.array([0, 2], dtype=np.int64)
    ok = concat_encoded_many(cat, off, lens, rows)
    assert ok is not None and len(ok[0]) == 1  # sane input concats fine

    for field_off in (4, 28):  # doc_count, n_hits u32 header fields
        forged = bytearray(b1 + b2)
        for blob_off in (0, len(b1)):
            forged[blob_off + field_off:blob_off + field_off + 4] = \
                struct.pack("<I", 0xFFFFFFF0)
        res = concat_encoded_many(
            np.frombuffer(bytes(forged), dtype=np.uint8), off, lens, rows)
        assert res is None, f"field at +{field_off} overflow not caught"


def test_hot_term_spanning_sort_blocks(ray_session, tmp_path):
    """A hot term whose rows outnumber a whole sort partition must straddle
    partition boundaries; the boundary-finish path merges its blob chain
    correctly at volume (VERDICT r2 next-#7).  40 segments x 'HOT' rows vs
    ~30 rows/partition guarantees the straddle."""
    import glob

    import pyarrow as pa

    rare = ["ALPHAX", "BETAX", "GAMMAX", "DELTAX", "EPSX"]
    docs = [f"hot hot hot {rare[i % 5].lower()}" for i in range(4000)]
    src = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"text": pa.array(docs)}), src,
                   row_group_size=100)
    idx = str(tmp_path / "idx")
    build_index(src, idx, content_column="text", tokenizer="simple",
                target_rows_per_partition=100)
    s0 = LocalSearcher(idx)
    assert len(s0.manifest.segments) == 40
    merged = str(tmp_path / "merged")
    merge_index(idx, merged)
    sm = LocalSearcher(merged)
    # the hot term's 40 source rows span >=2 sorted blocks -> it must be
    # finished via the boundary shard, not an interior block
    bshards = glob.glob(os.path.join(merged, "segments", "*", "postings",
                                     "*boundary*.parquet"))
    assert bshards
    bterms = set()
    for p in bshards:
        bterms.update(pq.read_table(p, columns=["term"]
                                    ).column("term").to_pylist())
    assert "HOT" in bterms
    # full-set equality + positional integrity across the stitched blob
    r0 = s0.search("hot", k=0)
    rm = sm.search("hot", k=0)
    np.testing.assert_array_equal(rm.doc_ids, r0.doc_ids)
    np.testing.assert_allclose(rm.scores, r0.scores, rtol=0, atol=0)
    assert rm.doc_ids.size == 4000
    ph0 = s0.search('"hot hot hot"', k=0)
    phm = sm.search('"hot hot hot"', k=0)
    np.testing.assert_array_equal(phm.doc_ids, ph0.doc_ids)


def test_merged_segment_prefers_sparse_union(dirs, monkeypatch):
    """A merged segment's doc_count spans the whole id space (holes where
    deletes applied), so the dense bincount union must stay OFF for
    low-hit-volume queries there (intended per the _union_count comment;
    VERDICT r2 wrong-#4) — and ON for hot unions on built segments."""
    import numpy as np

    from trinity_ray.search import LocalSearcher

    _idx, merged = dirs
    rm = LocalSearcher(merged).readers[0]
    span = rm.doc_count
    # few hits vs the span: 4*hits < span => dense must NOT engage
    allv = np.asarray([1, 2, 5, 7, 2, 5], dtype=np.int64)  # LOCAL ids
    assert 4 * allv.size < span
    def boom(*a, **kw):
        raise AssertionError("dense bincount used on sparse merged union")
    monkeypatch.setattr(np, "bincount", boom)
    out = rm._union_count_vals(allv, 1)
    monkeypatch.undo()
    np.testing.assert_array_equal(
        out, np.unique(allv).astype(np.uint64) + np.uint64(rm.doc_base))
    # positive control: hit volume comparable to span => dense engages
    calls = {"n": 0}
    real_bincount = np.bincount
    def counting(*a, **kw):
        calls["n"] += 1
        return real_bincount(*a, **kw)
    monkeypatch.setattr(np, "bincount", counting)
    hot = np.repeat(np.arange(span, dtype=np.int64), 1)  # LOCAL ids
    out2 = rm._union_count_vals(hot, 1)
    assert calls["n"] >= 1
    assert out2.size == span


# ---------------------------------------------------------------------------
# in-place tiered compaction (plan_compaction / compact_segments)
# ---------------------------------------------------------------------------

def _query_fingerprint(idx: str) -> list:
    s = LocalSearcher(idx)
    out = []
    for _name, _kind, q in REFERENCE_QUERIES[:8]:
        r = s.search(q, k=10)
        out.append((list(map(int, r.doc_ids)), [round(float(x), 10)
                                                for x in r.scores]))
    m = s.search("", k=0)
    out.append(sorted(int(d) for d in m.doc_ids))
    return out


def test_compact_subset_equals_uncompacted(ray_session, corpus_dir,
                                           tmp_path_factory):
    """Compacting a subset in place changes NOTHING about query results,
    stats totals, or the live-doc universe."""
    from trinity_ray.index.merge import compact_segments, plan_compaction
    from trinity_ray.index.segment import read_manifest

    base = tmp_path_factory.mktemp("compact")
    idx = str(base / "idx")
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=100)
    before = _query_fingerprint(idx)
    man0 = read_manifest(idx)
    tot0 = man0.total_stats()
    plans = plan_compaction(idx, min_run=2, max_run=4)
    assert plans and all(2 <= len(p) <= 4 for p in plans)
    n_before = len(man0.segments)
    man1 = compact_segments(idx, plans[0])
    assert len(man1.segments) == n_before - len(plans[0]) + 1
    assert _query_fingerprint(idx) == before
    tot1 = read_manifest(idx).total_stats()
    assert tot1.docs_cnt == tot0.docs_cnt
    assert tot1.sum_term_hits == tot0.sum_term_hits
    # retired dirs are gone; the compacted dir exists
    for n in plans[0]:
        assert not os.path.isdir(os.path.join(idx, "segments", n))
    # compact EVERY plan -> still identical
    for p in plan_compaction(idx, min_run=2, max_run=4):
        compact_segments(idx, p)
    assert _query_fingerprint(idx) == before


def test_compact_with_deletes_and_retention(ray_session, corpus_dir,
                                            tmp_path_factory):
    """Deletes from a newer generation apply during compaction; a compacted
    delete-carrying segment's list is retained as a deletes-only tombstone
    while older segments remain, so masking keeps working."""
    from trinity_ray.index.merge import compact_segments
    from trinity_ray.index.segment import read_manifest

    base = tmp_path_factory.mktemp("compact_del")
    idx = str(base / "idx")
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=100)
    delete_docs(idx, DELETED, generation=1)
    man = read_manifest(idx)
    posting = [s.name for s in man.segments if not s.has_deletes]
    # compact the FIRST two posting segments: the delete segment (gen 1)
    # stays, keeps masking both the compacted segment (gen 0) and the rest.
    # Match SETS and the live universe are invariant; scored top-k may
    # reorder near the cutoff because the compacted segment's stats are
    # recomputed over live docs (physically-applied deletes, same as the
    # reference's merge path — uncompacted segments still count masked
    # docs until their turn).
    s0 = LocalSearcher(idx)
    match_before = [sorted(map(int, s0.search(q, k=0).doc_ids))
                    for _n, _k, q in REFERENCE_QUERIES[:8]]
    man1 = compact_segments(idx, posting[:2])
    s1 = LocalSearcher(idx)
    match_after = [sorted(map(int, s1.search(q, k=0).doc_ids))
                   for _n, _k, q in REFERENCE_QUERIES[:8]]
    assert match_after == match_before
    s = LocalSearcher(idx)
    live = set(int(d) for d in s.search("", k=0).doc_ids)
    assert live.isdisjoint(DELETED)
    assert len(live) == N_DOCS - len(DELETED)
    # compacting ALL posting segments folds the deletes physically into one
    # segment with fully-recomputed stats — scores now equal merge_index's
    # whole-index rewrite of the same sources
    merged_ref = str(base / "merged_ref")
    merge_index(idx, merged_ref)
    posting1 = [x.name for x in man1.segments if not x.has_deletes]
    compact_segments(idx, posting1)
    assert _query_fingerprint(idx) == _query_fingerprint(merged_ref)


def test_compact_rejects_bad_input(ray_session, corpus_dir,
                                   tmp_path_factory):
    from trinity_ray.index.merge import compact_segments
    from trinity_ray.index.segment import read_manifest

    base = tmp_path_factory.mktemp("compact_bad")
    idx = str(base / "idx")
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=200)
    delete_docs(idx, [1], generation=1)
    man = read_manifest(idx)
    posting = [s.name for s in man.segments if not s.has_deletes]
    deleter = [s.name for s in man.segments if s.has_deletes][0]
    with pytest.raises(ValueError, match="unknown segments"):
        compact_segments(idx, ["nope", posting[0]])
    # single segment WITHOUT applicable deletes: nothing to do -> rejected
    # (doc 1 is deleted, so posting[0] holds a mask; posting[1] does not)
    with pytest.raises(ValueError, match="at least 2"):
        compact_segments(idx, [posting[1]])
    with pytest.raises(ValueError, match="deletes-only"):
        compact_segments(idx, [deleter, posting[0]])
    # single segment WITH deletes: the single-source masked rewrite is
    # allowed and folds them
    n_live_before = LocalSearcher(idx).search("", k=0).doc_ids.size
    man1 = compact_segments(idx, [posting[0]])
    comp = [s for s in man1.segments
            if s.doc_count > 0 and s.name not in posting][0]
    assert comp.masks_version >= 0
    assert LocalSearcher(idx).search("", k=0).doc_ids.size == n_live_before


def test_compact_redoes_after_precommit_crash(ray_session, corpus_dir,
                                              tmp_path_factory):
    """A compaction that crashed after writing (part of) its output dir
    but BEFORE the manifest commit is redone cleanly on retry: same name
    (manifest unchanged), stale dir replaced, results exact."""
    import hashlib as _h

    from trinity_ray.index.merge import compact_segments, plan_compaction
    from trinity_ray.index.segment import read_manifest, segment_dir

    base = tmp_path_factory.mktemp("compact_crash")
    idx = str(base / "idx")
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=150)
    before = _query_fingerprint(idx)
    man = read_manifest(idx)
    plan = plan_compaction(idx, min_run=2, max_run=3)[0]
    # reproduce the deterministic output name and plant a half-written dir
    ident = "|".join(sorted(plan)) + f"@{man.version}"
    name = f"g{man.segments[0].generation:06d}-c" + \
        _h.sha1(ident.encode()).hexdigest()[:8]
    orphan = segment_dir(idx, name)
    os.makedirs(os.path.join(orphan, "postings"))
    with open(os.path.join(orphan, "stats.json"), "w") as f:
        f.write("{corrupt")
    compact_segments(idx, plan)
    assert _query_fingerprint(idx) == before
    # the planted garbage is gone; the committed segment parses
    import json as _json

    with open(os.path.join(orphan, "stats.json")) as f:
        assert _json.load(f)["docs_cnt"] > 0


def test_merge_metrics_lineage(dirs):
    """merge_metrics.json (the merge-side analogue of build_metrics.json):
    per-shard fast/decode path counts aggregate to the dictionary size."""
    import json

    _, merged = dirs
    s = LocalSearcher(merged)
    seg = s.manifest.segments[0]
    with open(os.path.join(merged, "segments", seg.name,
                           "merge_metrics.json")) as f:
        m = json.load(f)
    t = m["total"]
    # path counters are INPUT-side term groups; terms is the OUTPUT
    # dictionary — the difference is terms whose postings were entirely
    # masked away (possible only on the decode path)
    eliminated = t["fast_path_terms"] + t["decode_path_terms"] - t["terms"]
    assert 0 <= eliminated <= t["decode_path_terms"]
    assert t["terms"] == seg.stats.total_terms
    # this fixture merges masked sources -> some decode-path work, and
    # clean sources -> some fast-path work
    assert t["decode_path_terms"] > 0 and t["fast_path_terms"] > 0
    assert len(m["sources"]) >= 2
    assert all(sh["terms"] >= 0 for sh in m["shards"].values())


def test_compact_gc_drops_fully_applied_delete_segments(ray_session,
                                                        corpus_dir,
                                                        tmp_path_factory):
    """consider_tracked_sources Delete decision: once every doc-carrying
    segment carries a delete list's effect (masks_version watermark), the
    deletes-only segment is dropped — repeated delete+compact cycles must
    not accumulate delete files."""
    from trinity_ray.index.merge import compact_segments
    from trinity_ray.index.segment import read_manifest

    base = tmp_path_factory.mktemp("compact_gc")
    idx = str(base / "idx")
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=150)
    for cycle, gen in enumerate((1, 2)):
        delete_docs(idx, [10 + cycle, 20 + cycle], generation=gen)
        man = read_manifest(idx)
        posting = [s.name for s in man.segments if s.doc_count > 0]
        compact_segments(idx, posting)
        man = read_manifest(idx)
        # all deletes physically applied -> no delete segments remain
        assert not any(s.has_deletes for s in man.segments), cycle
        assert sum(1 for s in man.segments if s.doc_count > 0) == 1
        comp = [s for s in man.segments if s.doc_count > 0][0]
        assert comp.masks_version >= 0
    s = LocalSearcher(idx)
    live = set(int(d) for d in s.search("", k=0).doc_ids)
    assert live.isdisjoint({10, 11, 20, 21})
    assert len(live) == N_DOCS - 4


def test_compact_gc_no_resurrection_on_generation_reuse(ray_session,
                                                        corpus_dir,
                                                        tmp_path_factory):
    """Review regression: a delete list created AFTER a compaction must
    never be GC'd as 'already applied', even when its generation falls
    below a previously-seen (and GC'd) delete generation — the watermark
    is the manifest version, not the generation."""
    from trinity_ray.index.merge import compact_segments
    from trinity_ray.index.segment import read_manifest

    base = tmp_path_factory.mktemp("compact_resurrect")
    idx = str(base / "idx")
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=150)
    # high-generation delete, then full compaction folds + GCs it
    delete_docs(idx, [5], generation=99)
    man = read_manifest(idx)
    compact_segments(idx, [s.name for s in man.segments if s.doc_count > 0])
    assert not any(s.has_deletes for s in read_manifest(idx).segments)
    # append a NEW build generation, then a LATER delete that re-uses a
    # LOWER generation than the GC'd one (as a fresh LiveIndex over this
    # manifest would derive: max doc generation is small) and targets a
    # doc inside the ALREADY-compacted segment O
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=200, generation=1)
    delete_docs(idx, [7], generation=10)
    live = set(int(d) for d in LocalSearcher(idx).search("", k=0).doc_ids)
    assert 7 not in live and 5 not in live
    # compact ONLY the new gen-1 segments — O is untouched, so the gen-10
    # list must SURVIVE (O has not applied it); a generation watermark
    # (old bug) would see O."applied up to 99" >= 10 and GC it unapplied
    man = read_manifest(idx)
    new_segs = [s2.name for s2 in man.segments
                if s2.doc_count > 0 and s2.generation == 1]
    assert len(new_segs) >= 2
    compact_segments(idx, new_segs)
    man = read_manifest(idx)
    assert any(s2.has_deletes for s2 in man.segments), \
        "gen-10 delete list GC'd while its target segment never applied it"
    live = set(int(d) for d in LocalSearcher(idx).search("", k=0).doc_ids)
    assert 7 not in live and 5 not in live, "deleted doc resurrected"
    # folding O itself finally retires the list
    man = read_manifest(idx)
    compact_segments(idx, [s2.name for s2 in man.segments
                           if s2.doc_count > 0])
    man = read_manifest(idx)
    assert not any(s2.has_deletes for s2 in man.segments)
    live = set(int(d) for d in LocalSearcher(idx).search("", k=0).doc_ids)
    assert 7 not in live and 5 not in live, "deleted doc resurrected"
    assert len(live) == 2 * N_DOCS - 2


def test_compact_duplicate_names_rejected_or_deduped(ray_session,
                                                     corpus_dir,
                                                     tmp_path_factory):
    """[a, a] must not build a corrupt doubled-docs segment: duplicates
    dedupe to a single-segment request, which (without applicable
    deletes) is rejected."""
    from trinity_ray.index.merge import compact_segments
    from trinity_ray.index.segment import read_manifest

    base = tmp_path_factory.mktemp("compact_dup")
    idx = str(base / "idx")
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=200)
    man = read_manifest(idx)
    a = [s.name for s in man.segments if s.doc_count > 0][0]
    with pytest.raises(ValueError, match="at least 2"):
        compact_segments(idx, [a, a])


def test_delete_docs_union_commit_order(ray_session, corpus_dir,
                                        tmp_path_factory, monkeypatch):
    """Crash-safety of the same-generation delete union: the manifest
    (created_version bump) commits BEFORE the widened delete file, so a
    crash in between loses the unacknowledged ids but can never leave
    new ids visible under a stale created_version (which tombstone GC
    could then drop unapplied — the resurrection class)."""
    import trinity_ray.index.merge as mg
    from trinity_ray.index.segment import read_manifest

    base = tmp_path_factory.mktemp("del_order")
    idx = str(base / "idx")
    build_index(corpus_dir, idx, id_columns=("repo", "path"),
                target_rows_per_partition=200)
    delete_docs(idx, [1], generation=5)
    v1 = read_manifest(idx).version
    cv1 = next(s.created_version for s in read_manifest(idx).segments
               if s.has_deletes)

    real_write_table = mg.pq.write_table

    def boom(*a, **k):
        raise RuntimeError("injected crash before the union file write")

    monkeypatch.setattr(mg.pq, "write_table", boom)
    with pytest.raises(RuntimeError, match="injected"):
        delete_docs(idx, [2], generation=5)
    monkeypatch.setattr(mg.pq, "write_table", real_write_table)
    man = read_manifest(idx)
    dele = next(s for s in man.segments if s.has_deletes)
    # manifest committed first: version and created_version advanced...
    assert man.version == v1 + 1 and dele.created_version > cv1
    # ...but the unacknowledged id 2 is NOT visible (file unchanged)
    live = set(int(d) for d in LocalSearcher(idx).search("", k=0).doc_ids)
    assert 1 not in live and 2 in live
    # a retried delete_docs completes the union
    delete_docs(idx, [2], generation=5)
    live = set(int(d) for d in LocalSearcher(idx).search("", k=0).doc_ids)
    assert 1 not in live and 2 not in live


def test_compaction_soak_over_nrt_ingest_stream(ray_session,
                                                tmp_path_factory):
    """The production lifecycle (merge.cpp:418-447) end-to-end at volume:
    a LiveIndex ingest stream with interleaved deletes, compacted every
    cycle, driven to steady state — match sets stay invariant across every
    compaction, the live universe always equals the model, segment tiers
    stay bounded instead of growing one-per-flush, and a final full
    compaction folds all tombstones away."""
    import random

    from trinity_ray.index.live import LiveIndex
    from trinity_ray.index.merge import compact_segments, plan_compaction
    from trinity_ray.index.segment import read_manifest

    idx = str(tmp_path_factory.mktemp("soak") / "idx")
    vocab = ["alpha", "beta", "gamma", "delta", "rare"]
    rng = random.Random(7)
    live = LiveIndex(None, tokenizer="simple", positions=True)
    model: dict[int, str] = {}          # doc_id -> text (live docs only)
    queries = ["alpha", "alpha AND beta", '"alpha beta"', "rare",
               "gamma NOT delta"]

    def expected(term_query: str) -> list[int]:
        s = LocalSearcher(idx)
        return sorted(int(d) for d in s.search(term_query, k=0).doc_ids)

    def model_match(q: str) -> list[int]:
        out = []
        for d, text in model.items():
            toks = text.upper().split()
            if q == "alpha":
                hit = "ALPHA" in toks
            elif q == "alpha AND beta":
                hit = "ALPHA" in toks and "BETA" in toks
            elif q == '"alpha beta"':
                hit = any(a == "ALPHA" and b == "BETA"
                          for a, b in zip(toks, toks[1:]))
            elif q == "rare":
                hit = "RARE" in toks
            else:  # gamma NOT delta
                hit = "GAMMA" in toks and "DELTA" not in toks
            if hit:
                out.append(d)
        return sorted(out)

    seg_counts = []
    for cycle in range(10):
        texts = [" ".join(rng.choices(vocab[:4], k=rng.randint(3, 9)))
                 + (" rare" if rng.random() < 0.1 else "")
                 for _ in range(40)]
        ids = live.add_documents(texts)
        model.update(zip((int(i) for i in ids), texts))
        if cycle >= 2:                   # delete some already-durable docs
            victims = rng.sample(sorted(model), 6)
            live.delete_documents(victims)
            for v in victims:
                model.pop(v)
        live.flush(idx)
        before = [expected(q) for q in queries]
        assert before == [model_match(q) for q in queries], cycle
        for plan in plan_compaction(idx, min_run=2, max_run=8):
            compact_segments(idx, plan)
        after = [expected(q) for q in queries]
        assert after == before, cycle    # compaction never changes matches
        seg_counts.append(len(read_manifest(idx).segments))
    # steady state: tiers bounded — 10 flushes + deletes must NOT mean
    # 10+ segments sitting in the manifest
    assert seg_counts[-1] < 8, seg_counts
    # final full compaction: one posting segment, all tombstones GC'd
    man = read_manifest(idx)
    posting = [s.name for s in man.segments if not s.has_deletes]
    if len(posting) >= 2:
        man = compact_segments(idx, posting)
    assert len([s for s in man.segments if not s.has_deletes]) == 1
    assert not [s for s in man.segments if s.has_deletes]
    assert [expected(q) for q in queries] == \
        [model_match(q) for q in queries]
    # the whole stream survived: live universe == model
    s = LocalSearcher(idx)
    assert sorted(int(d) for d in s.search("", k=0).doc_ids) == \
        sorted(model)


def test_compact_plans_wave_equals_sequential(ray_session, corpus_dir,
                                              tmp_path_factory):
    """A compaction WAVE (compact_plans: parallel builds against one
    manifest snapshot, sequential commits) produces the same query
    results, stats totals, and segment count as running compact_segments
    plan by plan — with deletes in play so the snapshot masks watermark
    is exercised."""
    from trinity_ray.index.merge import (compact_plans, compact_segments,
                                         plan_compaction)
    from trinity_ray.index.segment import read_manifest

    base = tmp_path_factory.mktemp("compact_wave")
    idxs = {}
    for variant in ("wave", "seq"):
        idx = str(base / variant)
        build_index(corpus_dir, idx, id_columns=("repo", "path"),
                    target_rows_per_partition=100)
        delete_docs(idx, [3, 7, 205, 411], generation=9)
        idxs[variant] = idx
    plans = plan_compaction(idxs["wave"], min_run=2, max_run=3)
    assert len(plans) >= 2, "need several disjoint plans for a wave"
    assert plans == plan_compaction(idxs["seq"], min_run=2, max_run=3)

    man_w = compact_plans(idxs["wave"], plans, max_parallel=3)
    for p in plans:
        man_s = compact_segments(idxs["seq"], p)
    assert _query_fingerprint(idxs["wave"]) == _query_fingerprint(idxs["seq"])
    assert len(man_w.segments) == len(man_s.segments)
    assert (read_manifest(idxs["wave"]).total_stats().__dict__
            == read_manifest(idxs["seq"]).total_stats().__dict__)
    # overlapping plans are rejected up front
    import pytest

    segs = [s.name for s in man_w.segments]
    a, b = segs[0], segs[1]
    with pytest.raises(ValueError, match="disjoint"):
        compact_plans(idxs["wave"], [[a, b], [b, a]])


def test_slice_tagged_batches_chunking():
    """tag()'s sub-batch slicer must reassemble bit-identically at ANY
    chunk size (the 1 GiB production threshold is never hit by test
    data, so force the multi-chunk path directly), keep every offset
    within int32, and refuse a single >=2 GiB blob."""
    import pyarrow as pa

    from trinity_ray.index.merge import _slice_tagged_batches

    rng = np.random.default_rng(7)
    n = 50
    lens = rng.integers(0, 97, n)
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=out_off[1:])
    values = rng.integers(0, 256, int(out_off[-1])).astype(np.uint8)
    term_col = pa.array([f"t{i:04d}" for i in range(n)])
    names = np.array([f"s{i % 3}" for i in range(n)], object)
    bases = np.arange(n, dtype=np.uint64) * 7

    def collect(chunk):
        tabs = list(_slice_tagged_batches(term_col, names, bases,
                                          out_off, values, chunk))
        assert all(t.column("blob").type == pa.binary() for t in tabs)
        return pa.concat_tables(tabs)

    ref = collect(1 << 30)          # single batch
    assert ref.num_rows == n
    for chunk in (1, 64, 257, 1000):
        got = collect(chunk)
        assert got.num_rows == n
        assert got.column("blob").to_pylist() == ref.column("blob").to_pylist()
        assert got.column("term").to_pylist() == ref.column("term").to_pylist()
        assert got.column("seg_name").to_pylist() == ref.column("seg_name").to_pylist()
        assert got.column("doc_base").to_pylist() == ref.column("doc_base").to_pylist()
    # chunk=1 forces one row per batch when every blob is non-empty
    # (adjacent ZERO-length rows legally coalesce, so use positive lens)
    lens_pos = lens + 1
    off_pos = np.zeros(n + 1, np.int64)
    np.cumsum(lens_pos, out=off_pos[1:])
    vals_pos = rng.integers(0, 256, int(off_pos[-1])).astype(np.uint8)
    assert len(list(_slice_tagged_batches(term_col, names, bases,
                                          off_pos, vals_pos, 1))) == n

    # empty input still yields one schema-correct empty batch
    empty = list(_slice_tagged_batches(
        pa.array([], pa.string()), np.array([], object),
        np.array([], np.uint64), np.zeros(1, np.int64),
        np.empty(0, np.uint8), 64))
    assert len(empty) == 1 and empty[0].num_rows == 0

    # a single >= 2 GiB blob cannot be encoded — must refuse loudly
    big_off = np.array([0, 1 << 31], np.int64)
    with pytest.raises(ValueError, match="2 GiB"):
        list(_slice_tagged_batches(pa.array(["t"]), np.array(["s"], object),
                                   np.array([0], np.uint64), big_off,
                                   np.empty(0, np.uint8), 1 << 30))
