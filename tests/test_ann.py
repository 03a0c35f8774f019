"""PQ (product quantization) ANN: exactness on reconstructible vectors.

IVF/brute-force coverage lives in the driver entries (`ann_*`) and
test_e2e paths; these tests pin the PQ math itself.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trinity_ray.ops.ann import pq_encode, pq_topk, pq_train  # noqa: E402


def _reconstructible(cb: np.ndarray, n: int, seed: int = 3):
    """Vectors built by concatenating codebook centroids: PQ encoding is
    lossless on them, so ADC distance == exact squared L2 distance."""
    m, k, dsub = cb.shape
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, k, size=(n, m))
    vecs = np.concatenate([cb[s][codes[:, s]] for s in range(m)], axis=1)
    return codes.astype(np.uint8), vecs


def test_pq_encode_lossless_and_adc_exact(ray_session):
    rng = np.random.default_rng(11)
    sample = rng.standard_normal((256, 16))
    cb = pq_train(sample, m=4, n_codes=8, iters=10)
    want_codes, vecs = _reconstructible(cb, 64)
    t = pa.table({"vec_id": list(range(64)),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    enc = pq_encode(rd.from_arrow(t), cb).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    got = np.vstack(enc["codes"].to_numpy())
    # ties possible only if two centroids coincide; random init makes that
    # measure-zero — encoding must recover the generating codes
    assert (got == want_codes).all()

    q = rng.standard_normal(16)
    top = pq_topk(pq_encode(rd.from_arrow(t), cb), cb,
                  q[None, :], k=10).to_pandas()
    exact = ((vecs - q) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(64), exact))[:10]
    assert top["vec_id"].tolist() == order.tolist()
    assert np.allclose(top["adc"].to_numpy(), exact[order])


def test_pq_train_shapes_and_dim_guard():
    sample = np.random.default_rng(0).standard_normal((64, 12))
    cb = pq_train(sample, m=3, n_codes=4, iters=5)
    assert cb.shape == (3, 4, 4)
    try:
        pq_train(sample, m=5, n_codes=4)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError for indivisible dim")


def test_pq_topk_merges_across_blocks(ray_session):
    """Global top-k over many blocks == single-block top-k (the driver
    merge sees only per-block candidates, never the corpus)."""
    rng = np.random.default_rng(5)
    sample = rng.standard_normal((256, 16))
    cb = pq_train(sample, m=4, n_codes=8, iters=10)
    _, vecs = _reconstructible(cb, 300, seed=9)
    t = pa.table({"vec_id": list(range(300)),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    q = rng.standard_normal(16)
    one = pq_topk(pq_encode(rd.from_arrow(t), cb), cb,
                  q[None, :], k=7).to_pandas()
    many = pq_topk(pq_encode(rd.from_arrow(t).repartition(16), cb), cb,
                   q[None, :], k=7, batch_size=32).to_pandas()
    assert one["vec_id"].tolist() == many["vec_id"].tolist()
    assert np.allclose(one["adc"], many["adc"])


def test_ivfpq_adc_matches_slow_replay(ray_session):
    """ivfpq_topk's vectorized probe-slot/table indexing vs a plain
    per-row Python replay of the same math (catches permutation bugs in
    the cluster -> probe-slot mapping)."""
    from trinity_ray.ops.ann import _normalize, ivfpq_build, ivfpq_topk

    rng = np.random.default_rng(21)
    X = rng.standard_normal((200, 32))
    t = pa.table({"vec_id": list(range(200)),
                  "embedding": pa.array(X.tolist(), pa.list_(pa.float64()))})
    cent, cb, coded = ivfpq_build(rd.from_arrow(t), n_clusters=4, m=8,
                                  n_codes=16, sample_size=256)
    coded = coded.materialize()
    q = rng.standard_normal(32)
    for nprobe in (1, 3, 4):
        got = ivfpq_topk(coded, cent, cb, q[None, :], k=15,
                         nprobe=nprobe).to_pandas()
        qn = _normalize(q[None, :])[0]
        probes = np.argsort(-(qn @ cent.T))[:nprobe]
        m, _k, dsub = cb.shape
        rows = coded.to_pandas()
        cand = []
        for vid, cl, codes in zip(rows["vec_id"], rows["cluster"],
                                  rows["codes"]):
            if cl not in probes:
                continue
            r = qn - cent[cl]
            adc = sum(((r[s * dsub:(s + 1) * dsub] - cb[s][codes[s]]) ** 2
                       ).sum() for s in range(m))
            cand.append((adc, vid))
        cand.sort()
        want_ids = [v for _, v in cand[:15]]
        want_adc = [a for a, _ in cand[:15]]
        assert got["vec_id"].tolist() == want_ids, f"nprobe={nprobe}"
        assert np.allclose(got["adc"], want_adc)
    # block-merge invariance
    a = ivfpq_topk(coded, cent, cb, q[None, :], k=9, nprobe=3).to_pandas()
    b = ivfpq_topk(coded.repartition(16), cent, cb, q[None, :], k=9,
                   nprobe=3, batch_size=16).to_pandas()
    assert a["vec_id"].tolist() == b["vec_id"].tolist()


def test_label_centroids_partition_independent(ray_session):
    from trinity_ray.ops.ann import label_centroids

    rng = np.random.default_rng(2)
    X = rng.standard_normal((120, 8))
    lab = rng.integers(0, 3, size=120)
    t = pa.table({"embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
                  "label": pa.array(lab, pa.int32())})
    got = label_centroids(rd.from_arrow(t)).to_pandas().sort_values(
        ["label", "i"]).reset_index(drop=True)
    got16 = label_centroids(rd.from_arrow(t).repartition(16)).to_pandas(
        ).sort_values(["label", "i"]).reset_index(drop=True)
    for L in range(3):
        want = X[lab == L].mean(axis=0)
        assert np.allclose(got[got.label == L]["mu"].to_numpy(), want)
    assert got["label"].tolist() == got16["label"].tolist()
    assert np.allclose(got["mu"], got16["mu"])


def test_empty_inputs_yield_empty_results(ray_session):
    """Empty datasets flow through every ANN/dedup stage without error —
    a filtered-out shard must not kill the pipeline."""
    from trinity_ray.ops.ann import (ivf_build, ivfpq_build, ivfpq_topk,
                                     label_centroids, pq_encode, pq_topk,
                                     pq_train)
    from trinity_ray.ops.dedup import dedup_against, semantic_dedup

    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    assert semantic_dedup(empty, n_clusters=2, threshold=0.9).count() == 0
    assert ivf_build(empty, n_clusters=2)[1].count() == 0
    cent, cb, coded = ivfpq_build(empty, n_clusters=2, m=2, n_codes=4)
    assert ivfpq_topk(coded, cent, cb, np.zeros((1, 2)), k=3).num_rows == 0
    cb2 = pq_train(np.zeros((0, 4)), m=2, n_codes=4)
    assert pq_topk(pq_encode(empty, cb2), cb2, np.zeros((1, 4)),
                   k=3).num_rows == 0
    edocs = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    docs = rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    out = dedup_against(docs, edocs).to_pandas()
    assert out["is_dup"].tolist() == [False]  # empty corpus: nothing dups
    assert dedup_against(edocs, docs).count() == 0
    elab = rd.from_arrow(pa.table({
        "embedding": pa.array([], pa.list_(pa.float64())),
        "label": pa.array([], pa.int32())}))
    assert label_centroids(elab).count() == 0


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------

def test_quantize_roundtrip_error_bound(ray_session):
    import ray.data as rd

    from trinity_ray.ops.ann import (_as_matrix, dequantize_matrix,
                                     quantize_embeddings)

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    vecs[7] = 0.0                                 # all-zero vector
    tbl = pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    out = quantize_embeddings(rd.from_arrow(tbl)).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    qcol = pa.array(out.qvec.tolist(), pa.list_(pa.int8()))
    deq = dequantize_matrix(qcol, out.scale.to_numpy())
    orig = _as_matrix(tbl.column("embedding"))
    # per-value error <= half a quantization step of that vector's scale
    step = out.scale.to_numpy()[:, None] / 127.0
    assert (np.abs(deq - orig) <= step * 0.5 + 1e-12).all()
    assert (deq[7] == 0.0).all()                  # zero vector stays zero
    # int8 range respected
    flat = np.concatenate(out.qvec.to_numpy())
    assert flat.min() >= -127 and flat.max() <= 127


def test_quantize_flatten_matches_compact(ray_session):
    import ray.data as rd

    from trinity_ray.ops.ann import quantize_embeddings

    rng = np.random.default_rng(12)
    tbl = pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array(
            [list(map(float, rng.normal(size=8))) for _ in range(20)],
            pa.list_(pa.float32())),
    })
    compact = quantize_embeddings(rd.from_arrow(tbl)).to_pandas(
        ).sort_values("vec_id").reset_index(drop=True)
    flat = quantize_embeddings(rd.from_arrow(tbl), flatten=True).to_pandas(
        ).sort_values(["vec_id", "dim_idx"]).reset_index(drop=True)
    assert len(flat) == 20 * 8
    for vid in range(20):
        rows = flat[flat.vec_id == vid]
        assert list(rows.q.astype(np.int64)) == \
            [int(x) for x in compact.qvec[vid]]
        assert (rows.scale.to_numpy() == compact.scale[vid]).all()


def test_hard_negatives_excludes_same_label_and_self(ray_session):
    from trinity_ray.ops.ann import hard_negatives

    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(60, 8)).astype(np.float64)
    labels = np.arange(60) % 3
    # make vec 1 (label 1) nearly identical to query 0 (label 0): it must
    # rank first; make vec 3 (label 0, same as query) identical — excluded
    vecs[1] = vecs[0] + 1e-6
    vecs[3] = vecs[0]
    tbl = pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    out = hard_negatives(rd.from_arrow(tbl), vecs[:2], np.array([0, 1]),
                         labels[:2], k=4).to_pandas()
    q0 = out[out.query_id == 0].sort_values("rank")
    got_labels = labels[q0.vec_id.to_numpy()]
    assert (got_labels != 0).all()                  # never the query label
    assert 0 not in q0.vec_id.tolist()              # never itself
    assert q0.vec_id.iloc[0] == 1                   # the planted near-dup
    assert len(q0) == 4
    # ranks are 1..k ordered by cosine desc
    assert q0["rank"].tolist() == [1, 2, 3, 4]
    assert (np.diff(q0.cosine.to_numpy()) <= 1e-12).all()


def test_hard_negatives_matches_bruteforce(ray_session):
    from trinity_ray.ops.ann import _normalize, hard_negatives

    rng = np.random.default_rng(22)
    vecs = rng.normal(size=(80, 6))
    labels = rng.integers(0, 4, 80)
    tbl = pa.table({
        "vec_id": pa.array(range(80), pa.int64()),
        "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int64()),
    })
    k = 6
    out = hard_negatives(rd.from_arrow(tbl), vecs[:5],
                         np.arange(5), labels[:5], k=k,
                         batch_size=16).to_pandas()
    # brute force on float32-truncated vectors (what the engine reads)
    v32 = _normalize(vecs.astype(np.float32).astype(np.float64))
    for q in range(5):
        sims = v32 @ v32[q]
        mask = (labels == labels[q]) | (np.arange(80) == q)
        sims[mask] = -np.inf
        order = np.lexsort((np.arange(80), -sims))[:k]
        got = out[out.query_id == q].sort_values("rank").vec_id.tolist()
        assert got == order.tolist()
