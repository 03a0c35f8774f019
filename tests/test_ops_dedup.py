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
    # at-scale path: broadcast_max_pairs=0 forces the distributed
    # semi-join text gather (no driver dict); results must be identical
    joined = verify_pairs_jaccard(cand, ds, threshold=0.5,
                                  broadcast_max_pairs=0)
    got_j = {(int(r.id_a), int(r.id_b)): float(r.jaccard)
             for r in joined.itertuples()}
    assert got_j == got


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


def test_truncated_bucket_oracle_parity(ray_session, tmp_path):
    """The driver oracles replicate the engine's deterministic per-bucket
    cap (sort by id, head(max_bucket)) via row_number — engine == oracle
    even on a degenerate corpus where a hot bucket truncates.  This runs
    the SAME SQL shape as oracle_sql() with a tiny cap so truncation
    actually triggers."""
    import duckdb
    import ray.data as rd

    from trinity_ray.ops.dedup import minhash_lsh_pairs, simhash_pairs

    # 12 identical docs (one all-bands-hot bucket) + some distinct ones
    docs = ["identical boilerplate text shared by everyone"] * 12 + [
        f"unique document number {i} with its own words" for i in range(8)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))

    # --- minhash, cap 4 < 12 hot-bucket members ---
    exp = str(tmp_path / "mh")
    pairs = minhash_lsh_pairs(ds, id_column="doc_id", text_column="text",
                              threshold=0.5, max_bucket=4, export_dir=exp)
    got = pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    want = duckdb.sql(f"""
WITH bh AS (SELECT band, band_hash, doc_id,
            row_number() OVER (PARTITION BY band, band_hash
                               ORDER BY doc_id) AS rk
            FROM read_parquet('{exp}/bands/*.parquet')),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bh a JOIN bh b
           ON a.band = b.band AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
         WHERE a.rk <= 4 AND b.rk <= 4),
se AS (SELECT doc_id, unnest(minhash) AS v,
              generate_subscripts(minhash, 1) AS i
       FROM read_parquet('{exp}/sigs/*.parquet')),
est AS (SELECT c.id_a, c.id_b,
               sum(CASE WHEN x.v = y.v THEN 1 ELSE 0 END) / 64.0 AS est_jaccard
        FROM cand c JOIN se x ON x.doc_id = c.id_a
             JOIN se y ON y.doc_id = c.id_b AND y.i = x.i
        GROUP BY c.id_a, c.id_b)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
ORDER BY id_a, id_b
""").df()
    assert got["id_a"].tolist() == want["id_a"].tolist()
    assert got["id_b"].tolist() == want["id_b"].tolist()
    np.testing.assert_allclose(got["est_jaccard"], want["est_jaccard"])
    # truncation DID trigger: the full (untruncated) pair set is larger
    assert len(got) < 12 * 11 // 2

    # --- simhash, cap 4 ---
    sexp = str(tmp_path / "sh")
    spairs = simhash_pairs(ds, id_column="doc_id", text_column="text",
                           max_hamming=3, max_bucket=4, sig_export_dir=sexp)
    sgot = spairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    swant = duckdb.sql(f"""
WITH s AS (SELECT doc_id, sig,
           CAST(sig AS HUGEINT)
             + CASE WHEN sig < 0
                    THEN CAST('18446744073709551616' AS HUGEINT)
                    ELSE CAST(0 AS HUGEINT) END AS u
           FROM read_parquet('{sexp}/*.parquet')),
b AS (SELECT doc_id, sig, band, (u // dv) % 65536 AS band_val,
             row_number() OVER (PARTITION BY band, (u // dv) % 65536
                                ORDER BY doc_id) AS rk
      FROM s CROSS JOIN (VALUES (0, CAST(1 AS HUGEINT)),
                                (1, CAST(65536 AS HUGEINT)),
                                (2, CAST(4294967296 AS HUGEINT)),
                                (3, CAST(281474976710656 AS HUGEINT)))
                        AS t(band, dv)),
p AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
             CAST(bit_count(xor(a.sig, b2.sig)) AS BIGINT) AS hamming
      FROM b a JOIN b b2 ON a.band = b2.band AND a.band_val = b2.band_val
           AND a.doc_id < b2.doc_id
      WHERE a.rk <= 4 AND b2.rk <= 4
        AND bit_count(xor(a.sig, b2.sig)) <= 3)
SELECT id_a, id_b, min(hamming) AS hamming FROM p GROUP BY id_a, id_b
ORDER BY id_a, id_b
""").df()
    assert sgot["id_a"].tolist() == swant["id_a"].tolist()
    assert sgot["id_b"].tolist() == swant["id_b"].tolist()
    assert sgot["hamming"].tolist() == swant["hamming"].tolist()
    assert len(sgot) < 12 * 11 // 2


def test_cluster_near_dups_transitive(ray_session):
    """Connected components: a-b and b-c edges put all three in one
    cluster keyed by the min id; untouched docs cluster to themselves."""
    import ray.data as rd

    from trinity_ray.ops.dedup import cluster_near_dups

    pairs = rd.from_items([
        {"id_a": 5, "id_b": 9}, {"id_a": 9, "id_b": 2},   # {2,5,9} -> 2
        {"id_a": 7, "id_b": 8},                            # {7,8} -> 7
    ])
    docs = rd.from_items([{"doc_id": i} for i in range(10)])
    got = dict(zip(*[cluster_near_dups(pairs, docs).to_pandas()
                     .sort_values("doc_id")[c].tolist()
                     for c in ("doc_id", "cluster")]))
    want = {i: i for i in range(10)}
    want.update({5: 2, 9: 2, 2: 2, 8: 7, 7: 7})
    assert got == want
    # no edges at all: everyone is their own cluster
    empty = rd.from_items([]) if False else rd.from_arrow(
        __import__("pyarrow").table({"id_a": [], "id_b": []}))
    got2 = cluster_near_dups(empty, docs).to_pandas()
    assert (got2["doc_id"] == got2["cluster"]).all()


def test_clear_export_dir_refuses_foreign(tmp_path):
    """The signature/bucket export seams must refuse to delete a dir
    holding anything but a prior parquet export (ADVICE r4 — blind
    rmtree of a misconfigured path silently destroyed data)."""
    import os

    import pytest

    from trinity_ray.ops.dedup import _clear_export_dir

    # absent / empty / parquet-only dirs are cleared silently
    _clear_export_dir(str(tmp_path / "absent"))
    prior = tmp_path / "prior"
    prior.mkdir()
    (prior / "0_000.parquet").write_bytes(b"x")
    _clear_export_dir(str(prior))
    assert not prior.exists()

    # a dir holding unrelated files must raise, untouched
    foreign = tmp_path / "home"
    foreign.mkdir()
    (foreign / "thesis.tex").write_text("important")
    with pytest.raises(RuntimeError, match="refusing"):
        _clear_export_dir(str(foreign))
    assert (foreign / "thesis.tex").read_text() == "important"


def test_dedup_lines_first_occurrence_wins(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import dedup_lines

    t = pa.table({"doc_id": [1, 2, 3], "text": [
        "hello world\nfoo\n\nhello world",     # self-dup dropped
        "foo bar baz\nhello world\nok",        # cross-doc dup dropped
        "foo bar baz\n\nxy",                   # dup + short lines kept
    ]})
    out = dedup_lines(rd.from_arrow(t), min_chars=4).to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == [
        "hello world\nfoo\n", "foo bar baz\nok", "\nxy"]
    assert out["n_kept"].tolist() == [3, 2, 2]
    assert out["n_dropped"].tolist() == [1, 1, 1]
    # idempotent: a second pass drops nothing
    again = dedup_lines(rd.from_arrow(
        pa.table({"doc_id": out.doc_id.tolist(),
                  "text": out.text.tolist()})), min_chars=4
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (again["n_dropped"] == 0).all()
    assert again["text"].tolist() == out["text"].tolist()


def test_semantic_dedup_exact_twins_and_outlier(ray_session, tmp_path):
    import ray.data as rd

    from trinity_ray.ops.dedup import semantic_dedup

    # two exact-twin pairs on orthogonal axes + one 45-degree outlier:
    # identical vectors ALWAYS share a cluster (identical argmax), so the
    # twin dups are invariant to where k-means puts the boundary
    vecs = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0],
            [0.7071, 0.7071]]
    t = pa.table({"vec_id": list(range(5)),
                  "embedding": pa.array(vecs, pa.list_(pa.float64()))})
    out = semantic_dedup(
        rd.from_arrow(t), vec_column="embedding", id_column="vec_id",
        threshold=0.95, n_clusters=2, sample_size=16,
        assign_export_dir=str(tmp_path / "asg")).to_pandas(
        ).sort_values("dup_id").reset_index(drop=True)
    assert out["dup_id"].tolist() == [1, 3]
    assert out["keep_id"].tolist() == [0, 2]
    assert np.allclose(out["cosine"], 1.0)
    # the export replays the assignment: every id exactly once
    import pyarrow.dataset as pads

    asg = pads.dataset(str(tmp_path / "asg")).to_table()
    assert sorted(asg.column("vec_id").to_pylist()) == [0, 1, 2, 3, 4]


def test_semantic_dedup_keep_is_smallest_qualifying_id(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import semantic_dedup

    # 2 duplicates both of id 0 (not chained 0<-1<-2): keep_id is the
    # SMALLEST lower id above threshold, per the SemDeDup election rule
    vecs = [[1.0, 0.0], [1.0, 0.001], [1.0, -0.001]]
    t = pa.table({"vec_id": [0, 1, 2],
                  "embedding": pa.array(vecs, pa.list_(pa.float64()))})
    out = semantic_dedup(
        rd.from_arrow(t), threshold=0.99, n_clusters=1, sample_size=16
        ).to_pandas().sort_values("dup_id").reset_index(drop=True)
    assert out["dup_id"].tolist() == [1, 2]
    assert out["keep_id"].tolist() == [0, 0]


def test_dedup_against_incremental(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import dedup_against

    corpus = pa.table({"doc_id": [10, 11, 12],
                       "text": ["hello world", "other text", None]})
    new = pa.table({"doc_id": [1, 2, 3, 4],
                    "text": ["hello world", "fresh stuff", "", "other text"]})
    out = dedup_against(rd.from_arrow(new), rd.from_arrow(corpus)
                        ).to_pandas().sort_values("doc_id"
                        ).reset_index(drop=True)
    # NULL corpus text keys as '' and matches the empty new doc
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["is_dup"].tolist() == [True, False, True, True]
    # prefix fingerprint: same 5-char opening counts as a dup
    out2 = dedup_against(rd.from_arrow(new), rd.from_arrow(corpus),
                         prefix_chars=5).to_pandas().sort_values("doc_id")
    assert out2["is_dup"].tolist() == [True, False, True, True]


# ---------------------------------------------------------------------------
# dup_spans (cross-document duplicated token windows)
# ---------------------------------------------------------------------------

def _brute_dup_spans(texts: list[str], w: int):
    """Reference: every w-token window occurring in >= 2 distinct docs."""
    from collections import defaultdict

    occ = defaultdict(list)
    for did, t in enumerate(texts):
        toks = t.split(" ")
        for i in range(len(toks) - w + 1):
            occ[" ".join(toks[i:i + w])].append((did, i))
    out = set()
    for sites in occ.values():
        if len({d for d, _ in sites}) >= 2:
            out.update(sites)
    return out


def test_dup_spans_md5_matches_bruteforce(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import dup_spans

    texts = [
        "a b c d e f",          # shares "b c d" with doc 1
        "x b c d y",
        "a b c q e f",          # "b c" too short for w=3 -> no hit vs doc 0
        "z z z",                # within-doc repeat only (single doc)
        "z z z",                # ...now cross-doc with doc 3
        "",                     # empty text
        "p q",                  # shorter than the window
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    res = dup_spans(ds, window=3).to_pandas()
    got = set(zip(res.doc_id, res.token_start))
    assert got == _brute_dup_spans(texts, 3)
    # every reported hash really does span >= 2 docs
    for h, grp in res.groupby("h"):
        assert grp.doc_id.nunique() >= 2


def test_dup_spans_rolling_occurrences_match_md5(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import dup_spans

    docs = corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    md5 = dup_spans(ds, window=5, hash_method="md5").to_pandas()
    roll = dup_spans(ds, window=5, hash_method="rolling").to_pandas()
    assert set(zip(md5.doc_id, md5.token_start)) == \
        set(zip(roll.doc_id, roll.token_start))
    assert len(md5) == len(roll)
    assert roll.h.dtype == np.int64          # groupby-safe key type


def test_dup_spans_within_doc_repeats_excluded(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import dup_spans

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["r s t r s t", "u v w"], pa.string()),
    }))
    res = dup_spans(ds, window=3).to_pandas()
    assert len(res) == 0          # "r s t" twice, but only inside doc 0


def test_dup_spans_max_group_cap(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import dup_spans

    texts = [f"pad{i} k l m" for i in range(8)]   # "k l m" in 8 docs
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    full = dup_spans(ds, window=3).to_pandas()
    assert len(full) == 8
    capped = dup_spans(ds, window=3, max_group=3).to_pandas()
    # deterministic: lowest (doc_id, token_start) sites survive the cap
    assert sorted(zip(capped.doc_id, capped.token_start)) == \
        sorted(zip(full.sort_values(["doc_id", "token_start"]
                                    ).head(3).doc_id,
                   full.sort_values(["doc_id", "token_start"]
                                    ).head(3).token_start))


def test_dup_spans_validates_args(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import dup_spans

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                 "text": pa.array(["a"], pa.string())}))
    with pytest.raises(ValueError):
        dup_spans(ds, window=0)
    with pytest.raises(ValueError):
        dup_spans(ds, hash_method="sha1")


def test_remove_dup_spans_keeps_first_site(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import remove_dup_spans

    texts = [
        "a b c d e f g h i j",      # first site of the shared window
        "x y a b c d e f g h w",    # loses the 8 shared tokens
        "p q r s t u v m n o",      # untouched
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = remove_dup_spans(ds, window=8).to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    assert out.text.tolist() == ["a b c d e f g h i j", "x y w",
                                 "p q r s t u v m n o"]
    assert out.n_dropped.tolist() == [0, 8, 0]
    assert out.n_kept.tolist() == [10, 3, 10]


def test_remove_dup_spans_overlapping_intervals_merge(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import remove_dup_spans

    # doc 1 repeats a 5-token run of doc 0: overlapping 3-windows cover
    # the whole run once (diff-array merge), not window-size times
    texts = ["k l m n o z1 z2", "q r k l m n o s"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(2), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = remove_dup_spans(ds, window=3).to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    assert out.text[0] == texts[0]
    assert out.text[1] == "q r s"
    assert out.n_dropped.tolist() == [0, 5]


def test_remove_dup_spans_rolling_matches_md5(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import remove_dup_spans

    docs = corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}))
    a = remove_dup_spans(ds, window=5, hash_method="md5").to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    b = remove_dup_spans(ds, window=5, hash_method="rolling").to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    assert a.text.tolist() == b.text.tolist()
    assert a.n_dropped.tolist() == b.n_dropped.tolist()


def test_remove_dup_spans_join_fallback_matches_broadcast(ray_session):
    import ray.data as rd

    from trinity_ray.ops.dedup import remove_dup_spans

    docs = corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}))
    bc = remove_dup_spans(ds, window=5).to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    jn = remove_dup_spans(ds, window=5, broadcast_max_docs=0).to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    assert bc.text.tolist() == jn.text.tolist()
    assert bc.n_dropped.tolist() == jn.n_dropped.tolist()
