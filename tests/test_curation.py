"""Corpus-curation ops: deterministic sampling, benchmark decontamination,
exact heavy-hitters vocabulary."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _docs(n=400, seed=5):
    rng = np.random.RandomState(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "kappa", "sigma"]
    texts = [" ".join(rng.choice(words, size=rng.randint(5, 40)))
             for _ in range(n)]
    langs = rng.choice(["en", "de", "fr", "zh"], size=n)
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "text": pa.array(texts),
                     "lang": pa.array(langs)})


def test_sample_md5_deterministic_and_partition_independent(ray_session):
    from trinity_ray.ops.sample import md5_threshold_hex, sample_by_hash

    t = _docs()
    ds = rd.from_arrow(t)
    a = sorted(sample_by_hash(ds, (1, 3), salt="x").to_pandas()["doc_id"])
    # different partitioning, same rows selected
    b = sorted(sample_by_hash(rd.from_arrow(t).repartition(13), (1, 3),
                              salt="x").to_pandas()["doc_id"])
    assert a == b
    # brute-force reference
    th = md5_threshold_hex((1, 3))
    want = sorted(int(d) for d in t.column("doc_id").to_pylist()
                  if hashlib.md5(f"{d}x".encode()).hexdigest() < th)
    assert a == want
    # rate edges
    assert sample_by_hash(rd.from_arrow(t), (0, 1)).count() == 0
    assert sample_by_hash(rd.from_arrow(t), (1, 1)).count() == t.num_rows


def test_sample_splitmix_rate_and_salt_decorrelation(ray_session):
    from trinity_ray.ops.sample import sample_by_hash

    t = _docs(n=4000)
    kept = sample_by_hash(rd.from_arrow(t), (1, 4),
                          method="splitmix").to_pandas()["doc_id"]
    assert 0.19 < len(kept) / 4000 < 0.31
    kept2 = sample_by_hash(rd.from_arrow(t), (1, 4), salt="other",
                           method="splitmix").to_pandas()["doc_id"]
    inter = len(set(kept) & set(kept2))
    # independent salts -> overlap ~ rate^2, far below either sample
    assert inter < 0.6 * min(len(kept), len(kept2))


def test_stratified_rates_and_default_drop(ray_session):
    from trinity_ray.ops.sample import md5_threshold_hex, stratified_sample

    t = _docs()
    out = stratified_sample(rd.from_arrow(t), {"en": (1, 1), "de": (1, 2)},
                            salt="q").to_pandas()
    langs = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("lang").to_pylist()))
    # strata not in rates are dropped entirely (default_rate 0)
    assert set(out["lang"]) <= {"en", "de"}
    # en rate 1 keeps every en doc
    n_en = sum(1 for v in langs.values() if v == "en")
    assert (out["lang"] == "en").sum() == n_en
    th = md5_threshold_hex((1, 2))
    want_de = {d for d, v in langs.items() if v == "de"
               and hashlib.md5(f"{d}q".encode()).hexdigest() < th}
    assert set(out[out["lang"] == "de"]["doc_id"]) == want_de


def test_decontaminate_flags_and_drop(ray_session):
    from trinity_ray.ops.decontam import decontaminate, text_shingles

    # plant one exact benchmark passage inside two docs
    passage = "the quick brown fox jumps over the lazy dog"
    texts = ["completely unrelated words here one two three four five",
             f"prefix words {passage} suffix words",
             "alpha beta gamma delta epsilon zeta eta theta iota kappa",
             passage]
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array(texts)})
    flagged = decontaminate(rd.from_arrow(t), [passage], n=3,
                            min_overlap=3).to_pandas().sort_values("doc_id")
    assert flagged["contaminated"].tolist() == [False, True, False, True]
    # the planted docs share every passage shingle
    n_sh = len(text_shingles(passage, 3))
    assert flagged["n_contaminated"].tolist()[3] == n_sh
    assert flagged["n_contaminated"].tolist()[1] == n_sh
    dropped = decontaminate(rd.from_arrow(t), [passage], n=3, min_overlap=3,
                            mode="drop").to_pandas()
    assert sorted(dropped["doc_id"]) == [0, 2]
    assert "n_contaminated" not in dropped.columns


def test_decontaminate_short_and_empty_texts(ray_session):
    from trinity_ray.ops.decontam import decontaminate

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["one two", "", None])})
    out = decontaminate(rd.from_arrow(t), ["one two three"],
                        n=3).to_pandas()
    assert out["n_contaminated"].tolist() == [0, 0, 0]


def test_top_terms_exact_and_tiebreak(ray_session):
    from collections import Counter

    from trinity_ray.ops.text import top_terms
    from trinity_ray.tokenizer import simple_tokenize

    t = _docs(n=300, seed=9)
    got = top_terms(rd.from_arrow(t), k=5).to_pandas()
    c = Counter()
    for x in t.column("text").to_pylist():
        c.update(simple_tokenize(x))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["term"], got["cnt"])) == [
        (k, v) for k, v in want]
    # ties break term-ascending: equal-count synthetic corpus
    t2 = pa.table({"text": pa.array(["b a", "a b", "c c"])})
    got2 = top_terms(rd.from_arrow(t2), k=3).to_pandas()
    assert got2["term"].tolist() == ["A", "B", "C"]
    assert got2["cnt"].tolist() == [2, 2, 2]


def test_repetition_stats_known_values(ray_session):
    from trinity_ray.ops.text import repetition_stats

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array([
                      "spam spam spam spam",          # 1.0 token, 1.0 bigram
                      "a b c d",                      # 0.25 token, 1/3 bigram
                      "a b a b a",                    # 3/5 token, 2/4 bigram
                      "",                             # empty -> 0, 0
                  ])})
    out = repetition_stats(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["top_token_frac"].tolist() == [1.0, 0.25, 0.6, 0.0]
    assert out["top_bigram_frac"].tolist() == [1.0, 0.3333, 0.5, 0.0]


def test_curated_export_composition(ray_session):
    """Dedup, decontamination and quota sampling compose: every stage's
    individual predicate holds on the composed output."""
    import hashlib as _h

    from trinity_ray.ops.decontam import text_shingles
    from trinity_ray.ops.sample import md5_threshold_hex
    from trinity_ray.pipelines.docsearch import q_curated_export

    sf = "/root/testdata/sf0.001"
    out = q_curated_export(sf).to_pandas()
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{sf}/documents.parquet'").df()
    winners = set(duckdb.sql(
        f"SELECT min(doc_id) FROM '{sf}/documents.parquet' GROUP BY text"
    ).df().iloc[:, 0])
    bench = set()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    langs = dict(zip(docs["doc_id"], docs["lang"]))
    for d, t in texts.items():
        if d % 17 == 0:
            bench |= text_shingles(t, 3)
    ths = {"en": md5_threshold_hex((1, 2)), "de": md5_threshold_hex((1, 4))}
    for d in out["doc_id"]:
        assert d in winners
        assert len(text_shingles(texts[d], 3) & bench) < 5
        lg = langs[d]
        assert lg in ths
        assert _h.md5(f"{d}ce".encode()).hexdigest() < ths[lg]


def test_export_curated_partitioned_and_resumable(ray_session, tmp_path):
    import glob
    import os

    import duckdb

    from trinity_ray.pipelines.export import export_curated

    t = _docs(n=300, seed=13)
    out = str(tmp_path / "export")
    m1 = export_curated(rd.from_arrow(t), out, partition_cols=("lang",))
    assert m1["rows"] == 300
    # hive layout: one directory per lang, >= 1 parquet file each
    for lang, cnt in m1["partitions"].items():
        files = glob.glob(os.path.join(out, f"lang={lang}", "*.parquet"))
        assert files, lang
        got = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{out}/lang={lang}/*.parquet')"
        ).fetchone()[0]
        assert got == cnt
    # read-back equality (partition col round-trips through hive paths)
    total = duckdb.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM "
        f"read_parquet('{out}/*/*.parquet', hive_partitioning=1)").fetchone()
    assert total == (300, 300)
    # finished export: rerun is a no-op returning the committed manifest
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(out, "*", "*.parquet"))}
    m2 = export_curated(rd.from_arrow(t.slice(0, 10)), out)
    assert m2 == m1
    assert all(os.path.getmtime(f) == mt for f, mt in mtimes.items())
    # UNFINISHED export (no DONE marker): rerun starts over cleanly
    os.remove(os.path.join(out, "DONE.json"))
    m3 = export_curated(rd.from_arrow(t), out)
    assert m3 == m1


def test_export_refuses_foreign_out_dir(ray_session, tmp_path):
    """export_curated must not rmtree a populated directory that does not
    look like a prior export attempt (ADVICE r3 #3)."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from trinity_ray.pipelines.export import export_curated

    out = str(tmp_path / "precious")
    os.makedirs(out)
    with open(os.path.join(out, "notes.txt"), "w") as f:
        f.write("unrelated data")
    t = pa.table({"doc_id": [1, 2], "lang": ["en", "de"]})
    with _pytest.raises(RuntimeError, match="refusing to delete"):
        export_curated(rd.from_arrow(t), out)
    assert os.path.exists(os.path.join(out, "notes.txt"))
    # an unfinished PRIOR ATTEMPT (only partition dirs / parquet) is still
    # restarted cleanly
    out2 = str(tmp_path / "attempt")
    os.makedirs(os.path.join(out2, "lang=en"))
    m = export_curated(rd.from_arrow(t), out2, partition_cols=("lang",))
    assert m["rows"] == 2


def test_scrub_pii_masks_and_counts(ray_session):
    from trinity_ray.ops.text import scrub_pii

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail bob.smith+x@corp.example.com or ping 10.0.0.1",
            "call +1 (415) 555-0199 today",
            "no pii here at all",
            "two mails: a@b.io c@d.org and 192.168.1.1",
        ],
    })
    got = scrub_pii(rd.from_arrow(t), text_column="text",
                    out_column="scrubbed").to_pandas().sort_values("doc_id")
    assert got["scrubbed"].tolist() == [
        "mail <EMAIL> or ping <IP>",
        "call <PHONE> today",
        "no pii here at all",
        "two mails: <EMAIL> <EMAIL> and <IP>",
    ]
    assert got["n_pii_email"].tolist() == [1, 0, 0, 2]
    assert got["n_pii_ipv4"].tolist() == [1, 0, 0, 1]
    assert got["n_pii_phone"].tolist() == [0, 1, 0, 0]
    # ordering guard: the email's digits are gone before the phone pass
    assert "<PHONE>" not in got["scrubbed"][0]


def test_scrub_pii_rescrub_no_duplicate_columns(ray_session):
    """Re-scrubbing an already-scrubbed dataset must replace the
    n_pii_* count columns, not append duplicates (ADVICE r4)."""
    from trinity_ray.ops.text import scrub_pii

    t = pa.table({"doc_id": [0, 1],
                  "text": ["mail a@b.io", "ip 10.0.0.1 x@y.io"]})
    once = scrub_pii(rd.from_arrow(t), text_column="text")
    twice = scrub_pii(once, text_column="text").to_pandas()
    assert sorted(twice.columns) == sorted(set(twice.columns))
    # second pass finds nothing: placeholders aren't PII
    assert twice["n_pii_email"].tolist() == [0, 0]
    assert twice["n_pii_ipv4"].tolist() == [0, 0]


def test_chunk_documents_windows(ray_session):
    from trinity_ray.ops.pack import chunk_documents

    vocab = ["AA", "BB", "CC"]            # ids 1, 2, 3; OOV -> 0
    t = pa.table({
        "doc_id": [7, 8, 9],
        "text": ["aa bb cc aa bb", "zz aa", ""],
    })
    got = chunk_documents(rd.from_arrow(t), vocab, seq_len=2,
                          text_column="text").to_pandas().sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)
    # doc 7: ids [1,2,3,1,2] -> chunks [1,2] [3,1] [2]
    #   checksums: 1*1+2*2=5, 1*3+2*1=5, 1*2=2
    # doc 8: ids [0,1] -> chunk [0,1] checksum 0*1+1*2=2; doc 9: no rows
    assert got["doc_id"].tolist() == [7, 7, 7, 8]
    assert got["chunk_idx"].tolist() == [0, 1, 2, 0]
    assert got["n_tokens"].tolist() == [2, 2, 1, 2]
    assert got["checksum"].tolist() == [5, 5, 2, 2]


def test_chunk_documents_overlapping_stride(ray_session):
    from trinity_ray.ops.pack import chunk_documents

    vocab = ["AA", "BB", "CC"]            # ids 1, 2, 3; OOV -> 0
    t = pa.table({"doc_id": [7], "text": ["aa bb cc aa bb"]})
    got = chunk_documents(rd.from_arrow(t), vocab, seq_len=3, stride=2,
                          text_column="text").to_pandas().sort_values(
        "chunk_idx").reset_index(drop=True)
    # ids [1,2,3,1,2], windows every 2: [1,2,3] [3,1,2] [2]
    #   checksums: 1+4+9=14, 3+2+6=11, 2
    assert got["chunk_idx"].tolist() == [0, 1, 2]
    assert got["n_tokens"].tolist() == [3, 3, 1]
    assert got["checksum"].tolist() == [14, 11, 2]
    # stride == seq_len reproduces the non-overlapping layout exactly
    a = chunk_documents(rd.from_arrow(t), vocab, seq_len=2
                        ).to_pandas().sort_values("chunk_idx")
    b = chunk_documents(rd.from_arrow(t), vocab, seq_len=2, stride=2
                        ).to_pandas().sort_values("chunk_idx")
    assert a["checksum"].tolist() == b["checksum"].tolist()
    assert a["n_tokens"].tolist() == b["n_tokens"].tolist()


def test_pack_sequences_small(ray_session):
    from trinity_ray.ops.pack import pack_sequences

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c", "", "d e f g h", "i"],
    })
    got = pack_sequences(rd.from_arrow(t), seq_len=4, range_span=2
                         ).to_pandas().sort_values(
        ["seq_id", "doc_id"]).reset_index(drop=True)
    # stream by id: doc0 3 toks | doc2 5 | doc3 1 -> 9 tokens, L=4:
    # seq0 = doc0[3] + doc2[1]; seq1 = doc2[4]; seq2 = doc3[1]
    assert got["seq_id"].tolist() == [0, 0, 1, 2]
    assert got["doc_id"].tolist() == [0, 2, 2, 3]
    assert got["n_tokens"].tolist() == [3, 1, 4, 1]


def test_pack_sequences_matches_bruteforce(ray_session):
    import random

    from trinity_ray.ops.pack import pack_sequences

    rnd = random.Random(42)
    ids = rnd.sample(range(1000), 60)          # sparse, unsorted ids
    texts = {i: " ".join("w" for _ in range(rnd.randrange(0, 23)))
             for i in ids}
    t = pa.table({"doc_id": ids, "text": [texts[i] for i in ids]})
    L = 16
    got = pack_sequences(rd.from_arrow(t), seq_len=L, range_span=64
                         ).to_pandas().sort_values(
        ["seq_id", "doc_id"]).reset_index(drop=True)

    # brute force: walk docs in id order, cut the concatenated stream
    expect, pos = [], 0
    for i in sorted(ids):
        n = len(texts[i].split())
        if n == 0:
            continue
        s, e = pos, pos + n
        for k in range(s // L, (e - 1) // L + 1):
            expect.append((k, i, min(e, (k + 1) * L) - max(s, k * L)))
        pos = e
    expect.sort()
    assert list(map(tuple, got.itertuples(index=False))) == expect
    # per-sequence totals: exactly L everywhere but the tail
    sums = got.groupby("seq_id")["n_tokens"].sum()
    assert (sums.iloc[:-1] == L).all() and 0 < sums.iloc[-1] <= L


def test_epoch_shuffle_is_a_stable_permutation(ray_session):
    from trinity_ray.ops.sample import epoch_shuffle

    t = pa.table({"doc_id": list(range(40))})
    a = epoch_shuffle(rd.from_arrow(t), seed="e1").to_pandas(
        ).sort_values("pos").reset_index(drop=True)
    # a permutation: every position once, every key once
    assert a["pos"].tolist() == list(range(40))
    assert sorted(a["doc_id"]) == list(range(40))
    # same seed -> same order; different seed -> different order
    b = epoch_shuffle(rd.from_arrow(t), seed="e1").to_pandas(
        ).sort_values("pos").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    c = epoch_shuffle(rd.from_arrow(t), seed="e2").to_pandas(
        ).sort_values("pos").reset_index(drop=True)
    assert a["doc_id"].tolist() != c["doc_id"].tolist()
    # order-sensitive vs md5: positions sort the hex ranks
    import hashlib
    expect = sorted(range(40), key=lambda k: hashlib.md5(
        (str(k) + "e1").encode()).hexdigest())
    assert a["doc_id"].tolist() == expect


def test_upsample_fractional_repetition(ray_session):
    import hashlib

    from trinity_ray.ops.sample import md5_threshold_hex, upsample

    t = pa.table({"doc_id": list(range(30)),
                  "lang": ["en", "fr", "de"] * 10})
    got = upsample(rd.from_arrow(t), (5, 2), salt="s",
                   columns=("lang",)).to_pandas().sort_values(
        ["doc_id", "repeat_idx"]).reset_index(drop=True)
    th = md5_threshold_hex((1, 2))
    for k in range(30):
        r = 2 + (hashlib.md5((str(k) + "s").encode()).hexdigest() < th)
        sub = got[got.doc_id == k]
        assert sub["repeat_idx"].tolist() == list(range(r))
        assert (sub["lang"] == ["en", "fr", "de"][k % 3]).all()
    # whole factors need no hash gate; factor < 1 is a subsample
    two = upsample(rd.from_arrow(t), 2).to_pandas()
    assert len(two) == 60
    half = upsample(rd.from_arrow(t), (1, 2), salt="s").to_pandas()
    assert (half["repeat_idx"] == 0).all() and 0 < len(half) < 30


def test_lm_surprisal_unigram_model(ray_session):
    import math

    from trinity_ray.ops.text import lm_surprisal

    # corpus: "aa" x3, "bb" x2, "cc" x1 -> total 6
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["aa aa bb", "aa bb cc", ""]})
    got = lm_surprisal(rd.from_arrow(t)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # empty doc emits no row
    assert got["doc_id"].tolist() == [1, 2]
    assert got["n_tokens"].tolist() == [3, 3]
    ln = math.log
    exp1 = round(ln(6) - (2 * ln(3) + ln(2)) / 3, 4)
    exp2 = round(ln(6) - (ln(3) + ln(2) + ln(1)) / 3, 4)
    assert got["surprisal_r"].tolist() == [exp1, exp2]
    # rarer wording scores strictly higher
    assert exp2 > exp1


def test_term_cooccurrence_lift_hand_worked(ray_session):
    from trinity_ray.ops.text import term_cooccurrence

    # docs: {a,b} x3, {a,c} x2, {b,c} x1, {d} x1 -> N=7
    # df: a=5 b=4 c=3 d=1; pairs: (a,b)=3 (a,c)=2 (b,c)=1
    t = pa.table({"doc_id": list(range(7)),
                  "text": ["a b", "a b b", "b a", "a c", "c a", "b c", "d"]})
    got = term_cooccurrence(rd.from_arrow(t), top=20, min_df=2).to_pandas()
    rows = {(r.term_a, r.term_b): r for r in got.itertuples()}
    # d is pruned by min_df=2, so only the three eligible pairs remain
    assert set(rows) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab, ac, bc = rows[("A", "B")], rows[("A", "C")], rows[("B", "C")]
    assert (ab.n_ab, ab.n_a, ab.n_b) == (3, 5, 4)
    assert (ac.n_ab, ac.n_a, ac.n_b) == (2, 5, 3)
    assert (bc.n_ab, bc.n_a, bc.n_b) == (1, 4, 3)
    assert ab.lift_r == round(3 * 7 / (5 * 4), 4)
    # ordering: lift desc -> (b,c)=0.583.. < (a,c)=0.933.. < (a,b)=1.05
    assert got["term_a"].tolist() == ["A", "A", "B"]
    assert got["lift_r"].tolist() == sorted(got["lift_r"], reverse=True)


def test_keywords_tfdf_top_k_and_ties(ray_session):
    from trinity_ray.ops.text import keywords_tfdf

    # df: common=3, rare=1, mid=2; doc 1 tf: common=2 rare=1 mid=1
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["common common rare mid", "common mid", "common"]})
    got = keywords_tfdf(rd.from_arrow(t), k=2).to_pandas()
    d1 = got[got.doc_id == 1].reset_index(drop=True)
    # scores: rare 1/1=1.0 > common 2/3=0.667 > mid 1/2=0.5 -> top-2
    assert d1["term"].tolist() == ["RARE", "COMMON"]
    assert d1["kw_r"].tolist() == [1.0, 0.6667]
    # doc 2: mid 1/2 > common 1/3; doc 3: single term
    d2 = got[got.doc_id == 2]
    assert d2["term"].tolist() == ["MID", "COMMON"]
    assert got[got.doc_id == 3]["term"].tolist() == ["COMMON"]
    # exact-tie (equal kw score) breaks by term ascending: craft tf/df so
    # two terms tie at 0.5 = 1/2 = 2/4
    t2 = pa.table({"doc_id": [1, 2, 3, 4],
                   "text": ["zz zz yy", "zz yy", "zz", "zz yy"]})
    # df: zz=4 yy=3; doc1 scores: zz 2/4=0.5, yy 1/3=0.333
    got2 = keywords_tfdf(rd.from_arrow(t2), k=1).to_pandas()
    assert got2[got2.doc_id == 1]["term"].tolist() == ["ZZ"]


def test_new_ops_survive_empty_blocks(ray_session):
    """0-row blocks (e.g. after an aggressive filter) must flow through
    the round-5 curation ops without numpy broadcast errors."""
    from trinity_ray.ops.dedup import dedup_lines
    from trinity_ray.ops.pack import pack_sequences
    from trinity_ray.ops.sample import sample_by_hash, upsample

    t = pa.table({"doc_id": list(range(8)),
                  "text": ["alpha beta\ngamma delta"] * 8})
    # rate (1, 10**30) empties every block deterministically
    emptied = sample_by_hash(rd.from_arrow(t), (1, 10**30))
    assert upsample(emptied, (5, 2)).to_pandas().empty
    assert dedup_lines(emptied).to_pandas().empty
    assert pack_sequences(emptied, seq_len=4).to_pandas().empty


def test_mixture_weights_per_stratum(ray_session):
    import hashlib

    from trinity_ray.ops.sample import md5_threshold_hex, mixture_weights

    t = pa.table({"doc_id": list(range(30)),
                  "lang": (["en"] * 10 + ["de"] * 10 + ["xx"] * 10)})
    got = mixture_weights(rd.from_arrow(t),
                          {"en": (1, 2), "de": (5, 2)}, salt="s",
                          columns=("lang",)).to_pandas()
    th = md5_threshold_hex((1, 2))

    def gate(k):
        return hashlib.md5((str(k) + "s").encode()).hexdigest() < th

    for k in range(30):
        lang = t.column("lang")[k].as_py()
        r = {"en": 0, "de": 2, "xx": 1}[lang] + (gate(k) if lang in
                                                 ("en", "de") else 0)
        sub = got[got.doc_id == k]
        assert sorted(sub["repeat_idx"]) == list(range(r)), (k, lang)
    # unknown stratum used default weight 1 -> exactly once
    assert (got[got.lang == "xx"].groupby("doc_id").size() == 1).all()


def test_bpe_train_classic_example(ray_session):
    from trinity_ray.ops.text import bpe_encode, bpe_train

    # classic BPE corpus: low x3, lower, lowest (simple tokenizer uppercases)
    t = pa.table({"doc_id": [1, 2], "text": ["low low low", "lower lowest"]})
    merges = bpe_train(rd.from_arrow(t), n_merges=10, min_pair_freq=2
                       ).to_pandas()
    # (L,O) and (O,W) tie at 5 -> lexicographically smallest first; then
    # (LO,W) at 5, then (LOW,E) at 2; everything else is freq 1 -> stop
    assert list(map(tuple, merges.itertuples(index=False))) == [
        (0, "L", "O", 5), (1, "LO", "W", 5), (2, "LOW", "E", 2)]

    enc = bpe_encode(rd.from_arrow(
        pa.table({"doc_id": [7], "text": ["low lowest"]})),
        bpe_train(rd.from_arrow(t), n_merges=10, min_pair_freq=2)
        ).to_pandas()
    # LOW -> [LOW]; LOWEST -> LOWE S T (rank-greedy application)
    assert enc["n_words"].tolist() == [2]
    assert enc["n_bpe"].tolist() == [1 + 3]
    assert enc["bpe_ratio_r"].tolist() == [2.0]


def test_bpe_encode_empty_and_oov(ray_session):
    from trinity_ray.ops.text import bpe_encode

    t = pa.table({"doc_id": [1, 2], "text": ["", "zz qq"]})
    enc = bpe_encode(rd.from_arrow(t), [(0, "A", "B")]).to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    # empty doc: 0 words, ratio 0; no applicable merges: chars per word
    assert enc["n_words"].tolist() == [0, 2]
    assert enc["n_bpe"].tolist() == [0, 4]
    assert enc["bpe_ratio_r"].tolist() == [0.0, 2.0]


def test_normalize_text_unicode_and_controls(ray_session):
    import unicodedata

    from trinity_ray.ops.text import normalize_text

    decomposed = unicodedata.normalize("NFD", "\u00e9tude")  # e + U+0301
    t = pa.table({"doc_id": [1, 2, 3, 4], "text": [
        decomposed,                # combining accent -> NFC composed
        "a\x00b\x07c",             # control chars stripped
        "  x \t\n  y  ",           # whitespace collapse + trim
        None,                      # null -> empty (counts as unchanged)
    ]})
    got = normalize_text(rd.from_arrow(t)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["text_norm"].tolist() == ["\u00e9tude", "abc", "x y", ""]
    assert got["changed"].tolist() == [True, True, True, False]
    # idempotent: normalizing the result changes nothing
    again = normalize_text(rd.from_arrow(pa.table(
        {"doc_id": got.doc_id.tolist(), "text": got.text_norm.tolist()}))
        ).to_pandas()
    assert (~again["changed"]).all()


def test_export_packed_resumable(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from trinity_ray.ops.pack import pack_sequences
    from trinity_ray.pipelines.export import export_packed

    t = pa.table({"doc_id": list(range(12)),
                  "text": ["w " * 9] * 12})        # 9 tokens per doc
    out = str(tmp_path / "packed")
    manifest = export_packed(rd.from_arrow(t), out, seq_len=16,
                             seqs_per_partition=2, range_span=4)
    # 12 docs x 9 tokens = 108 tokens -> 7 sequences -> 4 buckets of 2
    assert manifest["rows"] > 0
    assert set(manifest["partitions"]) == {"0", "1", "2", "3"}
    # written data round-trips to exactly the packer's output
    import pyarrow.dataset as pads

    back = pads.dataset(out, format="parquet", partitioning="hive",
                        ignore_prefixes=[".", "_", "DONE"]).to_table(
        ).select(["seq_id", "doc_id", "n_tokens"]).to_pandas().sort_values(
        ["seq_id", "doc_id"]).reset_index(drop=True)
    direct = pack_sequences(rd.from_arrow(t), seq_len=16, range_span=4
                            ).to_pandas().sort_values(
        ["seq_id", "doc_id"]).reset_index(drop=True)
    assert back.astype("int64").equals(direct.astype("int64"))
    # rerun of a finished export is a no-op returning the same manifest
    again = export_packed(rd.from_arrow(t), out, seq_len=16,
                          seqs_per_partition=2, range_span=4)
    assert again == manifest


def test_budget_trim_order_and_cutoff(ray_session):
    from trinity_ray.ops.sample import budget_trim

    t = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "score":  [9, 9, 5, 7, 5],
        "w":      [4, 3, 2, 5, 1],
    })
    # order: (9,1) w4 cum4 | (9,2) w3 cum7 | (7,4) w5 cum12 | (5,3) w2
    # cum14 > 13 -> dropped, and so is (5,5) even though it would fit —
    # the budget is a prefix cut, not a knapsack
    got = budget_trim(rd.from_arrow(t), 13, score_column="score",
                      weight_column="w").to_pandas().sort_values(
        "cum_weight").reset_index(drop=True)
    assert got["doc_id"].tolist() == [1, 2, 4]
    assert got["cum_weight"].tolist() == [4, 7, 12]
    # partition independence
    got16 = budget_trim(rd.from_arrow(t).repartition(4), 13,
                        score_column="score", weight_column="w"
                        ).to_pandas().sort_values("cum_weight")
    assert got16["doc_id"].tolist() == [1, 2, 4]
    # float scores refuse (exact bucketing contract)
    import pytest as _pt

    bad = pa.table({"doc_id": [1], "score": [1.5], "w": [1]})
    with _pt.raises(Exception, match="integer"):
        budget_trim(rd.from_arrow(bad), 10, score_column="score",
                    weight_column="w").materialize()


def test_budget_trim_random_vs_pandas(ray_session):
    import pandas as pd

    from trinity_ray.ops.sample import budget_trim

    rng = np.random.RandomState(3)
    n = 500
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "score": pa.array(rng.randint(0, 40, n), pa.int64()),
        "w": pa.array(rng.randint(1, 30, n), pa.int64()),
    })
    budget = 2000
    got = budget_trim(rd.from_arrow(t).repartition(7), budget,
                      score_column="score", weight_column="w"
                      ).to_pandas().sort_values("doc_id"
                      ).reset_index(drop=True)
    df = t.to_pandas().sort_values(["score", "doc_id"],
                                   ascending=[False, True])
    df["cum"] = df["w"].cumsum()
    want = df[df["cum"] <= budget].sort_values("doc_id")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["cum_weight"].tolist() == want["cum"].tolist()


def test_chunk_overlap_property_vs_bruteforce(ray_session):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trinity_ray.ops.pack import chunk_documents
    from trinity_ray.tokenizer import simple_tokenize

    vocab_terms = ["AA", "BB", "CC", "DD"]
    vmap = {t: i + 1 for i, t in enumerate(vocab_terms)}

    @settings(max_examples=25, deadline=None)
    @given(n_tok=st.integers(0, 60), L=st.integers(1, 9),
           S=st.integers(1, 9), seed=st.integers(0, 10_000))
    def inner(n_tok, L, S, seed):
        rng = np.random.default_rng(seed)
        words = rng.choice(["aa", "bb", "cc", "dd", "zz"], size=n_tok)
        text = " ".join(words)
        got = chunk_documents(rd.from_arrow(pa.table(
            {"doc_id": [1], "text": [text]})), vocab_terms,
            seq_len=L, stride=S).to_pandas()
        ids = [vmap.get(t, 0) for t in simple_tokenize(text)]
        if not ids:   # empty docs emit no rows (and no columns)
            assert len(got) == 0
            return
        got = got.sort_values("chunk_idx").reset_index(drop=True)
        want = []
        for ci, s in enumerate(range(0, len(ids), S)):
            chunk = ids[s:s + L]
            want.append((ci, len(chunk),
                         sum((j + 1) * v for j, v in enumerate(chunk))))
        assert list(zip(got["chunk_idx"], got["n_tokens"],
                        got["checksum"])) == want

    inner()


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (scale path)
# ---------------------------------------------------------------------------

def _rand_doc(rng, n_words: int) -> str:
    return " ".join(f"w{rng.integers(0, 5000)}" for _ in range(n_words))


def test_bloom_decontaminate_matches_exact(ray_session):
    """With planted passages the Bloom path must flag exactly the exact
    path's docs (zero false negatives ALWAYS; here the corpus is small
    enough that fp also lands at zero) and agree on distinct counts."""
    from trinity_ray.ops.decontam import decontaminate, decontaminate_bloom

    rng = np.random.default_rng(7)
    passage = "the quick brown fox jumps over the lazy dog"
    texts = [_rand_doc(rng, 30) for _ in range(40)]
    texts[5] = f"x y {passage} z"
    texts[17] = passage
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    exact = decontaminate(rd.from_arrow(t), [passage], n=3,
                          min_overlap=3).to_pandas().sort_values("doc_id")
    bloom = decontaminate_bloom(rd.from_arrow(t), [passage], n=3,
                                min_overlap=3, fp_rate=0.001
                                ).to_pandas().sort_values("doc_id")
    # superset property: every exactly-contaminated doc is Bloom-flagged
    assert not (exact["contaminated"] & ~bloom["contaminated"]).any()
    # counts can only over-count
    assert (bloom["n_contaminated"] >= exact["n_contaminated"]).all()
    # with min_overlap=3, isolated fp hits (deterministically 1 here —
    # a ~1.5e-4/probe filter over ~1.1k probes) never flip a flag
    assert bloom["contaminated"].tolist() == exact["contaminated"].tolist()
    # the planted docs agree exactly (no fp needed to reach their counts)
    assert bloom["n_contaminated"][5] == exact["n_contaminated"][5]
    assert bloom["n_contaminated"][17] == exact["n_contaminated"][17]
    # total over-count stays tiny: the fp budget, not a semantics gap
    assert (bloom["n_contaminated"] - exact["n_contaminated"]).sum() <= 2


def test_bloom_no_false_negatives_and_bounded_fp():
    """Direct filter properties on a large random hash population."""
    from trinity_ray.ops.decontam import ShingleBloom

    rng = np.random.default_rng(13)
    members = rng.integers(0, 1 << 63, 20_000, dtype=np.uint64)
    others = rng.integers(0, 1 << 63, 100_000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    b = ShingleBloom(len(members), fp_rate=0.01)
    b.add_many(members)
    assert b.contains_many(members).all()          # zero false negatives
    fp = b.contains_many(others).mean()
    assert fp <= 0.02                              # ~2x slack on 1% target
    # the advertised size win vs a Python set of the same hashes
    assert b.nbytes < 20_000 * 16


def test_bloom_decontaminate_empty_benchmark(ray_session):
    from trinity_ray.ops.decontam import decontaminate_bloom

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a b c d", "e f g h"])})
    out = decontaminate_bloom(rd.from_arrow(t), [], n=3).to_pandas()
    assert out["n_contaminated"].tolist() == [0, 0]
    assert not out["contaminated"].any()


def test_bloom_validates_fp_rate():
    from trinity_ray.ops.decontam import ShingleBloom

    with pytest.raises(ValueError):
        ShingleBloom(100, fp_rate=0.0)
    with pytest.raises(ValueError):
        ShingleBloom(100, fp_rate=1.5)
