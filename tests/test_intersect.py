"""intersection_alternatives analogue: mask counts vs brute-force python
(reference semantics: intersect.cpp:5-327)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.query.intersect import intersection_counts, intersection_counts_ray


@pytest.fixture(scope="module")
def small_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("isect")
    rng = np.random.default_rng(11)
    vocab = ["aa", "bb", "cc", "dd", "filler1", "filler2"]
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 5)).tolist())
            for _ in range(800)]
    pq.write_table(pa.table({"text": docs}), str(tmp / "d.parquet"),
                   row_group_size=200)
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, content_column="text",
                tokenizer="simple", positions=False,
                target_rows_per_partition=200)
    return idx, docs


def brute(docs, terms):
    out = {}
    for d in docs:
        toks = set(t.upper() for t in d.split())
        m = sum(1 << i for i, t in enumerate(terms) if t in toks)
        if m:  # docs containing none of the alternatives don't co-occur
            out[m] = out.get(m, 0) + 1
    return out


def test_intersection_counts_matches_brute(small_index):
    idx, docs = small_index
    terms = ["AA", "BB", "CC"]
    got = intersection_counts(idx, terms)
    assert got == brute(docs, terms)


def test_intersection_counts_ray_variant(small_index, ray_session):
    idx, docs = small_index
    terms = ["AA", "BB", "CC", "DD"]
    got = intersection_counts_ray(idx, terms, num_actors=2)
    assert got == brute(docs, terms)


def test_missing_terms_contribute_nothing(small_index):
    idx, docs = small_index
    got = intersection_counts(idx, ["AA", "NOSUCH"])
    want = brute(docs, ["AA", "NOSUCH"])
    assert got == want


def test_ivf_partitioned_equals_memory(ray_session, tmp_path):
    """Cluster-partitioned IVF (storage-level partition pruning) returns
    exactly the in-memory ivf_topk answer for the same centroids."""
    import numpy as np
    import ray.data as rd

    from trinity_ray.ops.ann import (
        ivf_build,
        ivf_topk,
        ivf_topk_partitioned,
        ivf_write_partitioned,
    )

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((400, 16))
    import pyarrow as pa

    tbl = pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64(), 16)),
    })
    qs = vecs[[3, 77, 200]]
    cent, assigned = ivf_build(rd.from_arrow(tbl), n_clusters=8,
                               sample_size=400)
    mem = ivf_topk(assigned, cent, qs, k=10, nprobe=3).to_pandas()
    out = str(tmp_path / "ivf")
    ivf_write_partitioned(rd.from_arrow(tbl), out, n_clusters=8,
                          sample_size=400)
    part = ivf_topk_partitioned(out, qs, k=10, nprobe=3).to_pandas()
    a = mem.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    b = part.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert a.equals(b)
    # partition layout on disk: one dir per cluster, no stray vectors read
    import os

    dirs = [d for d in os.listdir(out) if d.startswith("cluster=")]
    assert 1 < len(dirs) <= 8
