"""Randomized delete/merge fuzz: arbitrary delete sets at arbitrary
generations must match the oracle pre-merge (masking) and post-merge
(physical), including recomputed statistics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.index.merge import delete_docs, merge_index
from trinity_ray.oracle import OracleIndex
from trinity_ray.search import LocalSearcher

VOCAB = ["red", "green", "blue", "cyan", "teal", "plum", "gold", "gray"]


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_random_deletes_match_oracle(tmp_path, ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 300
    docs = [" ".join(rng.choice(VOCAB, rng.integers(1, 9)).tolist())
            for _ in range(n)]
    pq.write_table(pa.table({"text": docs}), str(tmp_path / "d.parquet"),
                   row_group_size=60)
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, content_column="text",
                tokenizer="simple", target_rows_per_partition=60)
    # two waves of random deletes at increasing generations
    dele1 = sorted(rng.choice(n, rng.integers(5, 40), replace=False).tolist())
    dele2 = sorted(rng.choice(n, rng.integers(5, 40), replace=False).tolist())
    delete_docs(idx, dele1, generation=1)
    delete_docs(idx, dele2, generation=2)
    gone = set(dele1) | set(dele2)

    oracle = OracleIndex("simple")
    for i, d in enumerate(docs):
        oracle.add(i, d)
    # note: pre-merge idf still counts deleted docs (stats change only on
    # merge, index_source.h:199-216), so compare MATCH SETS pre-merge and
    # full rank-identity post-merge against an oracle without the docs.
    s = LocalSearcher(idx)
    for q in ["red", "green AND blue", "cyan OR plum", '"teal gold"']:
        got = set(int(d) for d in s.search(q, k=0).doc_ids)
        want = oracle.match(__import__("trinity_ray.query.ast",
                                       fromlist=["parse_query"]
                                       ).parse_query(q, "simple")) - gone
        assert got == want, (seed, q)

    merged = str(tmp_path / "merged")
    merge_index(idx, merged)
    for d in gone:
        oracle.erase(d)
    sm = LocalSearcher(merged)
    assert sm.n_docs == n - len(gone)
    for q in ["red", "green AND blue", "cyan OR plum", "red NOT gray",
              "[2 red green blue]"]:
        got = sm.search(q, k=10)
        want = oracle.search(q, k=10)
        assert [int(d) for d in got.doc_ids] == [d for d, _ in want], (seed, q)
        np.testing.assert_allclose(got.scores, [x for _, x in want],
                                   rtol=1e-12)
