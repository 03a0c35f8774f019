"""Randomized boolean/phrase ASTs: engine match + scored top-k must equal
the pure-Python oracle on every draw (SURVEY.md §5 oracle-based E2E,
generalized beyond the fixed query set)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.oracle import OracleIndex
from trinity_ray.query.ast import (
    And,
    MatchSome,
    Node,
    Not,
    Optional_,
    Near,
    Or,
    Phrase,
    Token,
    normalize,
)
from trinity_ray.search import LocalSearcher

VOCAB = ["ALPHA", "BETA", "GAMMA", "DELTA", "EPS", "ZETA", "ETA", "THETA",
         "NOSUCH1", "NOSUCH2"]


def rand_node(rng: np.random.Generator, depth: int) -> Node:
    kinds = ["token", "token", "phrase", "near"]
    if depth > 0:
        kinds += ["and", "or", "not", "some", "opt"]
    k = rng.choice(kinds)
    if k == "token":
        return Token(str(rng.choice(VOCAB)))
    if k == "phrase":
        n = int(rng.integers(2, 4))
        return Phrase(tuple(str(t) for t in rng.choice(VOCAB, n)))
    if k == "near":
        n = int(rng.integers(2, 4))
        return Near(tuple(str(t) for t in rng.choice(VOCAB, n)),
                    window=int(rng.integers(1, 6)))
    if k == "not":
        # NOT is meaningful inside And (anti-join); pair it with a positive
        return And((rand_node(rng, depth - 1), Not(rand_node(rng, depth - 1))))
    if k == "opt":
        return And((rand_node(rng, depth - 1), Optional_(Token(str(rng.choice(VOCAB))))))
    if k == "some":
        n = int(rng.integers(2, 5))
        return MatchSome(int(rng.integers(1, n + 1)),
                         tuple(rand_node(rng, 0) for _ in range(n)))
    children = tuple(rand_node(rng, depth - 1) for _ in range(int(rng.integers(2, 4))))
    return And(children) if k == "and" else Or(children)


@pytest.fixture(scope="module", params=["varint", "packed"])
def fuzz_index(tmp_path_factory, ray_session, request):
    codec = request.param
    tmp = tmp_path_factory.mktemp(f"fuzz-{codec}")
    rng = np.random.default_rng(99)
    docs = [" ".join(rng.choice([v.lower() for v in VOCAB[:8]],
                                rng.integers(1, 15)).tolist())
            for _ in range(900)]
    pq.write_table(pa.table({"text": docs}), str(tmp / "d.parquet"),
                   row_group_size=300)
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, content_column="text",
                tokenizer="simple", positions=True,
                target_rows_per_partition=300, codec=codec,
                payloads="char_offset")
    oracle = OracleIndex("simple")
    for i, d in enumerate(docs):
        oracle.add(i, d)
    return idx, oracle


def test_random_asts_match_oracle(fuzz_index):
    idx, oracle = fuzz_index
    s = LocalSearcher(idx)
    rng = np.random.default_rng(7)
    from trinity_ray.query.exec import EMPTY_U64
    from trinity_ray.search import merge_topk

    for trial in range(120):
        node = normalize(rand_node(rng, depth=2))
        # full match set
        parts = [r.execute(node, {}, 0) for r in s.readers]
        got = sorted(int(d) for d in
                     merge_topk([p for p in parts if p[0].size], 0).doc_ids)
        want = sorted(oracle.match(node))
        assert got == want, f"trial {trial}: {node!r}"
        # scored top-10
        res = s.search(node, k=10)
        want_sc = oracle.search(node, k=10)
        assert [int(d) for d in res.doc_ids] == [d for d, _ in want_sc], \
            f"trial {trial}: {node!r}"
        np.testing.assert_allclose(res.scores, [x for _, x in want_sc],
                                   rtol=1e-12, err_msg=repr(node))


def test_match_some_presence_matrix(fuzz_index):
    """Deterministic sweep: MatchSome over every (children, present, k)
    combination up to 4 children — the r5 review found a k>=2
    single-present-child bug that 120 random trials had missed, so the
    space is now enumerated instead of sampled.  Nodes are NOT
    normalized: this pins raw evaluator semantics."""
    idx, oracle = fuzz_index
    s = LocalSearcher(idx)
    from trinity_ray.search import merge_topk

    present = ["ALPHA", "BETA", "GAMMA", "DELTA"]
    missing = ["NOSUCH1", "NOSUCH2", "NOSUCHX", "NOSUCHY"]
    for n in range(2, 5):
        for n_present in range(0, n + 1):
            toks = tuple(Token(t) for t in
                         present[:n_present] + missing[:n - n_present])
            for k in range(1, n + 1):
                node = MatchSome(k, toks)
                parts = [r.execute(node, {}, 0) for r in s.readers]
                got = sorted(int(d) for d in merge_topk(
                    [p for p in parts if p[0].size], 0).doc_ids)
                want = sorted(oracle.match(node))
                assert got == want, f"n={n} present={n_present} k={k}"
