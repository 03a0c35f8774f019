"""CLI surface (python -m trinity_ray …): build / search / merge /
percolate subcommands — the `ray job submit` entry point."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.cli import main

DOCS = ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon",
        "alpha epsilon", "beta beta beta"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    path = str(tmp / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "content": pa.array(DOCS, pa.string()),
    }), path)
    return str(tmp), path


def test_cli_build_and_search(corpus, tmp_path, capsys, ray_session):
    root, path = corpus
    idx = str(tmp_path / "idx")
    rc = main(["build", "--input", path, "--index", idx,
               "--tokenizer", "simple"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] == len(DOCS)

    rc = main(["search", "--index", idx, "--query", "beta AND gamma", "-k", "3"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {r["doc_id"] for r in rows} == {0, 1}

    rc = main(["search", "--index", idx, "--query", "beta", "--scorer", "trivial"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows[0]["doc_id"] == 4 and rows[0]["score"] == 3.0  # tf=3


def test_cli_merge(corpus, tmp_path, capsys, ray_session):
    root, path = corpus
    idx = str(tmp_path / "idx2")
    main(["build", "--input", path, "--index", idx, "--tokenizer", "simple"])
    capsys.readouterr()
    merged = str(tmp_path / "merged")
    rc = main(["merge", "--index", idx, "--out", merged])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] == len(DOCS)


def test_cli_percolate(corpus, tmp_path, capsys, ray_session):
    root, path = corpus
    rc = main(["percolate", "--input", path, "--tokenizer", "simple",
               "--id-column", "doc_id",
               "--query", "q1=alpha", "--query", 'q2="beta gamma"'])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    got = {(r["doc_id"], r["query_name"]) for r in rows}
    assert got == {(0, "q1"), (3, "q1"), (0, "q2"), (1, "q2")}


def test_cli_codec_and_rich_mode(tmp_path, ray_session, capsys):
    """build --codec packed --payloads char_offset; search --mode rich
    returns per-term rows with positions and payloads."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from trinity_ray.cli import main

    docs = ["aa bb aa", "bb cc", "aa cc dd"]
    pq.write_table(pa.table({"text": pa.array(docs)}),
                   os.path.join(str(tmp_path), "c.parquet"))
    idx = os.path.join(str(tmp_path), "idx")
    rc = main(["build", "--input", os.path.join(str(tmp_path), "c.parquet"),
               "--index", idx, "--content-column", "text",
               "--tokenizer", "simple", "--codec", "packed",
               "--payloads", "char_offset", "--target-rows", "10"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["search", "--index", idx, "--query", "aa", "--mode", "rich"])
    assert rc == 0
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["term"] == "AA" for r in rows)
    r0 = [r for r in rows if r["doc_id"] == 0][0]
    assert r0["tf"] == 2 and r0["positions"] == [1, 3]
    assert r0["payloads"] == [0, 6]  # char offsets of "aa" in doc 0
    rc = main(["search", "--index", idx, "--query", "aa OR dd",
               "--mode", "subtrees"])
    assert rc == 0
    assert capsys.readouterr().out.strip()


def test_cli_compact(tmp_path, capsys, ray_session):
    from trinity_ray.fixtures import write_corpus

    corpus_dir = str(tmp_path / "corpus")
    write_corpus(corpus_dir, 600, n_files=2, seed=11, row_group_size=128)
    idx = str(tmp_path / "idx")
    main(["build", "--input", corpus_dir, "--index", idx,
          "--target-rows", "150"])
    capsys.readouterr()
    rc = main(["compact", "--index", idx, "--min-run", "2", "--max-run", "3",
               "--dry-run"])
    assert rc == 0
    plans = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["plans"]
    assert plans and all(2 <= len(p) <= 3 for p in plans)
    rc = main(["compact", "--index", idx, "--min-run", "2", "--max-run", "3"])
    assert rc == 0
    done = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(done["compacted"]) == len(plans)
    rc = main(["search", "--index", idx, "--query", "while", "-k", "2"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and rows[0]["score"] > 0


def test_cli_facet_and_suggest(tmp_path, capsys, ray_session):
    path = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "content": pa.array(["alpha beta", "alpha", "beta", "alpha",
                             "beta gamma", "alpha beta"], pa.string()),
        "lang": pa.array(["en", "de", "en", "en", "de", "de"]),
    }), path)
    idx = str(tmp_path / "idx")
    assert main(["build", "--input", path, "--index", idx,
                 "--tokenizer", "simple", "--id-columns", "lang"]) == 0
    capsys.readouterr()
    assert main(["facet", "--index", idx, "--query", "alpha",
                 "--column", "lang"]) == 0
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["value"]: r["n_docs"] for r in rows} == {"en": 2, "de": 2}
    assert main(["suggest", "--index", idx, "--prefix", "b", "-k", "3"]) == 0
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert rows[0] == {"term": "BETA", "df": 4}


def test_cli_curate(tmp_path, ray_session, capsys):
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from trinity_ray.cli import main

    docs = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(
            [f"the quick brown fox number {i} jumps over the lazy dog"
             for i in range(20)] * 2),   # 20 exact dups
    })
    src = tmp_path / "docs.parquet"
    pq.write_table(docs, str(src))
    out = tmp_path / "curated"
    rc = main(["curate", "--input", str(src), "--out", str(out),
               "--min-words", "3"])
    assert rc == 0
    manifest = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < manifest["rows"] <= 20          # dups dropped
    # resumable: second run returns the recorded manifest, no rewrite
    rc2 = main(["curate", "--input", str(src), "--out", str(out),
                "--min-words", "3"])
    assert rc2 == 0
    manifest2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest2["rows"] == manifest["rows"]


def test_build_from_jsonl_matches_parquet(ray_session, tmp_path):
    """A JSONL corpus stages once into Parquet and produces an index whose
    search results are identical to the Parquet-built index."""
    import os

    from trinity_ray.search import LocalSearcher

    docs = [{"doc_id": i, "content": t} for i, t in enumerate(DOCS)]
    jl = tmp_path / "corpus.jsonl"
    jl.write_text("\n".join(json.dumps(d) for d in docs) + "\n")
    pqf = tmp_path / "corpus.parquet"
    pq.write_table(pa.table({
        "doc_id": [d["doc_id"] for d in docs],
        "content": [d["content"] for d in docs]}), pqf)

    idx_j = str(tmp_path / "idx_jsonl")
    idx_p = str(tmp_path / "idx_parquet")
    assert main(["build", "--input", str(jl), "--index", idx_j,
                 "--tokenizer", "simple"]) == 0
    assert main(["build", "--input", str(pqf), "--index", idx_p,
                 "--tokenizer", "simple"]) == 0
    # staging committed with a DONE marker; rerun is a no-op
    assert os.path.exists(os.path.join(idx_j, "staging", "DONE.json"))
    for q in ("beta", "alpha AND epsilon", '"beta gamma"'):
        a = LocalSearcher(idx_j).search(q, k=10)
        b = LocalSearcher(idx_p).search(q, k=10)
        assert list(a.doc_ids) == list(b.doc_ids)
        assert list(a.scores) == list(b.scores)


def test_cli_ann_methods(tmp_path, capsys, ray_session):
    import numpy as np

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((96, 16))
    pqf = tmp_path / "emb.parquet"
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(96), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    }), pqf)
    outs = {}
    for method in ("brute", "ivf", "pq", "ivfpq"):
        assert main(["ann", "--embeddings", str(pqf), "--method", method,
                     "--query-id", "3", "-k", "5",
                     "--n-clusters", "4", "--nprobe", "4",
                     "--pq-m", "4", "--pq-codes", "16"]) == 0
        rows = [json.loads(ln) for ln in
                capsys.readouterr().out.strip().splitlines()]
        assert len(rows) == 5
        assert all(r["vec_id"] != 3 for r in rows)
        outs[method] = [r["vec_id"] for r in rows]
    # with nprobe == n_clusters, IVF scans everything: exact == brute
    assert outs["ivf"] == outs["brute"]


def test_cli_curate_span_dedup(tmp_path, ray_session, capsys):
    """--dedup-span-window strips cross-doc duplicated token runs before
    doc-level cleaning: docs sharing a long boilerplate prefix keep it
    only in the first doc."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from trinity_ray.cli import main

    header = ("this license header grants permission to use copy and "
              "modify the software freely")           # shared boilerplate
    bodies = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs for the party",
        "how vexingly quick daft zebras jump over fences today",
        "sphinx of black quartz judge my vow and speak plainly",
        "the five boxing wizards jump quickly over the tall wall",
        "bright vixens jump while dozy fowl quack in the barn",
        "jinxed wizards pluck ivy from the big quilt every morning",
        "amazingly few discotheques provide jukeboxes for dancing crowds",
    ]
    docs = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array([f"{header} {b}" for b in bodies]),
    })
    src = tmp_path / "docs.parquet"
    pq.write_table(docs, str(src))
    out = tmp_path / "curated_spans"
    rc = main(["curate", "--input", str(src), "--out", str(out),
               "--min-words", "3", "--dedup-span-window", "8"])
    assert rc == 0
    manifest = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # bodies are distinct (no near-dup collapse); one row may still fall
    # to the quality/lang heuristics, which is clean_corpus's business
    assert manifest["rows"] >= 6
    import glob

    got = pq.ParquetDataset(sorted(glob.glob(f"{out}/**/*.parquet",
                                             recursive=True))).read()
    texts = sorted(got.column("text").to_pylist())
    # exactly one doc still carries the boilerplate header
    assert sum(t.startswith("this license header") for t in texts) == 1
    assert any("quick brown fox" in t for t in texts)
    assert any("discotheques" in t for t in texts)
