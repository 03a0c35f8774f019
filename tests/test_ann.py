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
