"""Similarity search over an embedding column (``list<float>``).

Two paths per the task brief:

- **Brute-force cosine top-k** (the exactness baseline): the query matrix is
  normalized once and broadcast via ``ray.put``; each ``map_batches`` task
  computes one ``Q @ V.T`` matmul per batch (numpy, float64) and keeps only
  its local top-k per query, so the driver merge sees ``O(num_blocks * Q * k)``
  candidate rows — never the corpus.
- **IVF** (the scale path): coarse k-means centroids fit on a driver-side
  sample, cluster assignment as a vectorized ``map_batches`` stage, then
  queries probe only the ``nprobe`` nearest clusters — the per-batch matmul
  is masked down to member vectors.  Recall<1 by design; verified against
  brute force in tests (tests/test_ann.py).

At 100 TB the assignment stage would write cluster-partitioned Parquet so a
query reads only ``nprobe`` partitions; here the partition pruning is the
in-batch mask (same computation, single-node layout).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from trinity_ray.rayutil import actor_pool, package_runtime_env


def _gather(cands, id_column: str) -> pa.Table:
    """Collect the (small) per-block candidate tables onto the driver."""
    parts = list(cands.iter_batches(batch_size=8192, batch_format="pyarrow"))
    if not parts:
        return pa.table({
            "query_id": pa.array([], pa.int64()),
            id_column: pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        })
    return pa.concat_tables(parts)


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(N, D) float64 matrix from a list<float> column (zero-copy flatten)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class BruteForceTopK:
    """Actor stage: per-batch cosine top-k against a broadcast query
    matrix.  Optional per-query exclusion masks (``query_ids`` +
    ``query_labels`` with ``label_column``) turn the same scan into
    hard-negative mining: candidates sharing the query's label, or being
    the query row itself, are masked to -inf before the top-k."""

    def __init__(self, queries: np.ndarray, k: int,
                 vec_column: str = "embedding", id_column: str = "vec_id",
                 exclude_ids: tuple[int, ...] = (),
                 query_ids: np.ndarray | None = None,
                 query_labels: np.ndarray | None = None,
                 label_column: str = "label"):
        self.q = _normalize(np.asarray(queries, dtype=np.float64))
        self.k = k
        self.vec_column = vec_column
        self.id_column = id_column
        self.exclude = np.asarray(sorted(exclude_ids), dtype=np.int64)
        self.qids = (None if query_ids is None
                     else np.asarray(query_ids, dtype=np.int64))
        self.qlab = (None if query_labels is None
                     else np.asarray(query_labels, dtype=np.int64))
        self.label_column = label_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_numpy()
        v = _normalize(_as_matrix(batch.column(self.vec_column)))
        labels = None
        if self.qlab is not None:
            labels = batch.column(self.label_column).cast(
                pa.int64()).to_numpy(zero_copy_only=False)
        if self.exclude.size:
            keep = ~np.isin(ids, self.exclude)
            ids, v = ids[keep], v[keep]
            if labels is not None:
                labels = labels[keep]
        if ids.size == 0:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                self.id_column: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            })
        sims = self.q @ v.T                      # (Q, B)
        if self.qlab is not None:
            mask = self.qlab[:, None] == labels[None, :]
            if self.qids is not None:
                mask |= self.qids[:, None] == ids[None, :]
            sims[mask] = -np.inf
        k = min(self.k, ids.size)
        # local top-k per query (argpartition then exact ordering)
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_i, out_c = [], [], []
        for qi in range(self.q.shape[0]):
            sel = part[qi]
            sel = sel[np.isfinite(sims[qi, sel])]    # drop masked slots
            order = np.lexsort((ids[sel], -sims[qi, sel]))
            out_q.append(np.full(order.size, qi, np.int64))
            out_i.append(ids[sel][order])
            out_c.append(sims[qi, sel][order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            self.id_column: pa.array(np.concatenate(out_i).astype(np.int64),
                                     pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64()),
        })


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, *,
                     vec_column: str = "embedding", id_column: str = "vec_id",
                     exclude_ids: tuple[int, ...] = (),
                     query_ids: np.ndarray | None = None,
                     query_labels: np.ndarray | None = None,
                     label_column: str = "label",
                     batch_size: int = 4096, concurrency: int = 2):
    """Exact cosine top-k: returns a pyarrow Table
    (query_id, <id_column>, cosine), globally merged with tie-break
    (cosine desc, id asc).  ``query_ids``/``query_labels`` switch on the
    per-query hard-negative mask (see BruteForceTopK)."""
    cands = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries=queries, k=k, vec_column=vec_column,
                                   id_column=id_column, exclude_ids=exclude_ids,
                                   query_ids=query_ids,
                                   query_labels=query_labels,
                                   label_column=label_column),
        batch_format="pyarrow", batch_size=batch_size, concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env(),
    )
    t = _gather(cands, id_column)
    if t.num_rows == 0:
        return t
    qid = t.column("query_id").to_numpy()
    ids = t.column(id_column).to_numpy()
    cos = t.column("cosine").to_numpy()
    out_q, out_i, out_c = [], [], []
    for q in np.unique(qid):
        m = qid == q
        order = np.lexsort((ids[m], -cos[m]))[:k]
        out_q.append(np.full(order.size, q, np.int64))
        out_i.append(ids[m][order])
        out_c.append(cos[m][order])
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), pa.int64()),
        id_column: pa.array(np.concatenate(out_i), pa.int64()),
        "cosine": pa.array(np.concatenate(out_c), pa.float64()),
    })


# ---------------------------------------------------------------------------
# IVF: coarse k-means + nprobe search
# ---------------------------------------------------------------------------

def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 15,
               seed: int = 7) -> np.ndarray:
    """Deterministic Lloyd's k-means on normalized vectors (cosine ≈ L2 on
    the unit sphere).  Driver-side; the sample is small by construction."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    if n == 0:                      # empty sample: no centroids to fit
        return np.zeros((0, x.shape[1] if x.ndim == 2 else 0), np.float64)
    k = min(n_clusters, n)
    cent = x[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


class IvfAssign:
    """map_batches stage: nearest-centroid cluster id per vector."""

    def __init__(self, centroids: np.ndarray, vec_column: str = "embedding",
                 id_column: str = "vec_id"):
        self.cent = np.asarray(centroids, dtype=np.float64)
        self.vec_column = vec_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _normalize(_as_matrix(batch.column(self.vec_column)))
        cluster = (np.argmax(v @ self.cent.T, axis=1)
                   if len(v) else np.empty(0, np.int64))
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "cluster": pa.array(cluster.astype(np.int32), pa.int32()),
            "nvec": pa.array(v.tolist(),
                             pa.list_(pa.float64(), v.shape[1] if v.size else 0)),
        })


def _sample_matrix(ds, vec_column: str, sample_size: int) -> np.ndarray:
    """Driver-side (sample_size, dim) matrix from the head of the dataset
    — the one small read that seeds every codebook/centroid fit."""
    chunks = [b.column(vec_column).combine_chunks()
              for b in ds.limit(sample_size).iter_batches(
                  batch_size=sample_size, batch_format="pyarrow")]
    if not chunks:                       # empty dataset: (0, 0) matrix
        return np.zeros((0, 0), dtype=np.float64)
    return _as_matrix(pa.chunked_array(chunks))


def ivf_build(ds, *, n_clusters: int = 16, sample_size: int = 2048,
              vec_column: str = "embedding", id_column: str = "vec_id",
              seed: int = 7, concurrency: int = 2, sample=None):
    """Fit centroids on a sample, assign every vector.  Returns
    (centroids, assigned Dataset with columns id/cluster/nvec).
    ``sample``: optionally pass a pre-drawn (n, dim) matrix so composed
    builds (ivfpq_build) read the head of ``ds`` once, not twice."""
    if sample is None:
        sample = _sample_matrix(ds, vec_column, sample_size)
    cent = kmeans_fit(sample, n_clusters, seed=seed)
    assigned = ds.map_batches(
        IvfAssign,
        fn_constructor_kwargs=dict(centroids=cent, vec_column=vec_column,
                                   id_column=id_column),
        batch_format="pyarrow", concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env(),
    )
    return cent, assigned


def ivf_topk(assigned, centroids: np.ndarray, queries: np.ndarray,
             k: int = 10, *, nprobe: int = 4, id_column: str = "vec_id",
             batch_size: int = 4096, concurrency: int = 2):
    """Probe the ``nprobe`` nearest clusters per query; exact cosine inside.
    Returns (query_id, <id_column>, cosine) pyarrow Table."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    cent = np.asarray(centroids, dtype=np.float64)
    nprobe = min(nprobe, cent.shape[0])
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]   # (Q, nprobe)

    def search(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy()
        cl = batch.column("cluster").to_numpy()
        v = _as_matrix(batch.column("nvec"))
        out_q, out_i, out_c = [], [], []
        for qi in range(q.shape[0]):
            m = np.isin(cl, probes[qi])
            if not m.any():
                continue
            sims = v[m] @ q[qi]
            kk = min(k, sims.size)
            part = np.argpartition(-sims, kk - 1)[:kk]
            order = np.lexsort((ids[m][part], -sims[part]))
            out_q.append(np.full(kk, qi, np.int64))
            out_i.append(ids[m][part][order])
            out_c.append(sims[part][order])
        if not out_q:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                id_column: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            })
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            id_column: pa.array(np.concatenate(out_i).astype(np.int64), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64()),
        })

    cands = assigned.map_batches(search, batch_format="pyarrow",
                                 batch_size=batch_size,
                                 runtime_env=package_runtime_env())
    t = _gather(cands, id_column)
    qid = t.column("query_id").to_numpy()
    ids = t.column(id_column).to_numpy()
    cos = t.column("cosine").to_numpy()
    out_q, out_i, out_c = [], [], []
    for qv in np.unique(qid):
        m = qid == qv
        order = np.lexsort((ids[m], -cos[m]))[:k]
        out_q.append(np.full(order.size, qv, np.int64))
        out_i.append(ids[m][order])
        out_c.append(cos[m][order])
    if not out_q:
        return t
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), pa.int64()),
        id_column: pa.array(np.concatenate(out_i), pa.int64()),
        "cosine": pa.array(np.concatenate(out_c), pa.float64()),
    })


# ---------------------------------------------------------------------------
# IVF scale path: cluster-partitioned Parquet (probe = read nprobe partitions)
# ---------------------------------------------------------------------------

def ivf_write_partitioned(ds, out_dir: str, *, n_clusters: int = 16,
                          sample_size: int = 2048,
                          vec_column: str = "embedding",
                          id_column: str = "vec_id", seed: int = 7,
                          concurrency: int = 2):
    """Persist an IVF index as cluster-partitioned Parquet: centroids.npy +
    one ``cluster=<c>/`` directory per coarse cluster.

    This is the 100-TB story the in-memory path can't give: a query with
    ``nprobe`` probes READS ONLY its nprobe partitions from storage —
    vectors in unprobed clusters never leave disk, instead of being
    scanned-and-masked.  Returns the centroid matrix."""
    import json

    import ray.data as rd  # noqa: F401

    cent, assigned = ivf_build(ds, n_clusters=n_clusters,
                               sample_size=sample_size,
                               vec_column=vec_column, id_column=id_column,
                               seed=seed, concurrency=concurrency)
    os.makedirs(out_dir, exist_ok=True)
    assigned.write_parquet(out_dir, partition_cols=["cluster"],
                           compression="zstd")
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    with open(os.path.join(out_dir, "ivf.json"), "w") as f:
        json.dump({"n_clusters": int(cent.shape[0]), "dim": int(cent.shape[1]),
                   "id_column": id_column}, f)
    return cent


def ivf_topk_partitioned(index_dir: str, queries: np.ndarray, k: int = 10,
                         *, nprobe: int = 4, id_column: str = "vec_id",
                         batch_size: int = 4096):
    """Top-k over a cluster-partitioned IVF index: per query, only the
    ``nprobe`` nearest clusters' partition directories are read (partition
    pruning at the storage layer).  Exact cosine within probed clusters;
    same output schema as :func:`ivf_topk`."""
    import ray.data as rd

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    nprobe = min(nprobe, cent.shape[0])
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]   # (Q, nprobe)
    needed = sorted(set(int(c) for c in probes.ravel()))
    paths = []
    probed_dirs = 0
    for c in needed:
        d = os.path.join(index_dir, f"cluster={c}")
        if os.path.isdir(d):
            probed_dirs += 1
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_column: pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    # Ray hive-infers the "cluster" partition column from the directory
    # names (as a string); normalize it to int32 for the probe mask
    assigned = rd.read_parquet(paths)

    def fix_cluster(batch: pa.Table) -> pa.Table:
        cl = np.asarray([int(x) for x in
                         batch.column("cluster").to_pylist()], dtype=np.int32)
        return batch.set_column(
            batch.schema.get_field_index("cluster"), "cluster",
            pa.array(cl, pa.int32()))

    assigned = assigned.map_batches(fix_cluster, batch_format="pyarrow")
    return ivf_topk(assigned, cent, queries, k, nprobe=nprobe,
                    id_column=id_column, batch_size=batch_size)


# ---------------------------------------------------------------------------
# PQ: product quantization + asymmetric-distance (ADC) scan
# ---------------------------------------------------------------------------

def _lloyd(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic plain-L2 Lloyd's k-means (UNLIKE kmeans_fit, no
    normalization — PQ quantizes raw subvectors, not directions)."""
    rng = np.random.default_rng(seed)
    if x.shape[0] == 0:             # empty sample: zero-code codebook
        return np.zeros((0, x.shape[1]), np.float64)
    k = min(k, x.shape[0])
    cent = x[rng.choice(x.shape[0], size=k, replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None]) ** 2).sum(-1)
        assign = d2.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def pq_train(sample: np.ndarray, *, m: int = 8, n_codes: int = 16,
             iters: int = 15, seed: int = 7) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split the
    dimension into ``m`` contiguous subspaces and run an independent
    k-means with ``n_codes`` centroids in each.  Returns codebooks of
    shape ``(m, n_codes, dim // m)``.  Driver-side on a sample, like
    kmeans_fit — the expensive part (encode + scan) is distributed."""
    x = np.asarray(sample, dtype=np.float64)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if n_codes > 256:
        # codes persist as uint8; more would silently wrap modulo 256
        raise ValueError(f"n_codes {n_codes} > 256 cannot be stored in "
                         f"uint8 codes; raise m instead")
    dsub = dim // m
    return np.stack([
        _lloyd(x[:, s * dsub:(s + 1) * dsub], n_codes, iters, seed + s)
        for s in range(m)
    ])


def _merge_adc_topk(cands, id_column: str, k: int) -> pa.Table:
    """Driver merge of per-block ADC candidates: global top-k per query,
    adc ascending, ties on id (shared by pq_topk / ivfpq_topk)."""
    t = _gather(cands, id_column)
    if "adc" not in t.column_names or t.num_rows == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_column: pa.array([], pa.int64()),
                         "adc": pa.array([], pa.float64())})
    qid = t.column("query_id").to_numpy()
    ids = t.column(id_column).to_numpy()
    adc = t.column("adc").to_numpy()
    out_q, out_i, out_d = [], [], []
    for qv in np.unique(qid):
        msk = qid == qv
        order = np.lexsort((ids[msk], adc[msk]))[:k]
        out_q.append(np.full(order.size, qv, np.int64))
        out_i.append(ids[msk][order])
        out_d.append(adc[msk][order])
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), pa.int64()),
        id_column: pa.array(np.concatenate(out_i), pa.int64()),
        "adc": pa.array(np.concatenate(out_d), pa.float64()),
    })


def _pq_assign_codes(x: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, m) uint8 nearest-centroid codes of ``x`` under per-subspace
    codebooks ``cb`` (m, K, dsub); empty input yields (0, m)."""
    m, _k, dsub = cb.shape
    codes = np.zeros((len(x), m), dtype=np.uint8)
    if not len(x):
        return codes
    for s in range(m):
        sub = x[:, s * dsub:(s + 1) * dsub]
        d2 = ((sub[:, None, :] - cb[s][None]) ** 2).sum(-1)
        codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
    return codes


class PqEncode:
    """Actor stage: nearest-codebook-entry code per subspace per vector —
    the 64-dim float64 vector compresses to ``m`` uint8 codes (64x here),
    which is what makes a 100-TB corpus scannable from memory."""

    def __init__(self, codebooks: np.ndarray, vec_column: str = "embedding",
                 id_column: str = "vec_id"):
        self.cb = np.asarray(codebooks, dtype=np.float64)  # (m, K, dsub)
        self.vec_column = vec_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _as_matrix(batch.column(self.vec_column))
        codes = _pq_assign_codes(x, self.cb)
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "codes": pa.array(codes.tolist(),
                              pa.list_(pa.uint8(), self.cb.shape[0])),
        })


def pq_encode(ds, codebooks: np.ndarray, *, vec_column: str = "embedding",
              id_column: str = "vec_id", concurrency: int = 2):
    """Encode every vector to its PQ codes (map_batches actor pool; the
    codebooks ship once per actor via constructor kwargs)."""
    return ds.map_batches(
        PqEncode,
        fn_constructor_kwargs=dict(codebooks=codebooks, vec_column=vec_column,
                                   id_column=id_column),
        batch_format="pyarrow", concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env(),
    )


def pq_topk(codes_ds, codebooks: np.ndarray, queries: np.ndarray,
            k: int = 10, *, id_column: str = "vec_id",
            batch_size: int = 8192, concurrency: int = 2):
    """ADC (asymmetric distance) top-k: per query, a ``(m, n_codes)``
    table of exact query-subvector-to-centroid squared distances is
    precomputed ONCE; scanning a batch of codes is then pure table
    lookups + a row sum — no float vectors are ever read.  Returns
    ``(query_id, <id_column>, adc)`` with adc ascending, ties on id.

    Scale shape identical to brute_force_topk: broadcast tables, per-batch
    local top-k, driver merges O(num_blocks * Q * k) candidates — but each
    batch touches m bytes per vector instead of 8*dim."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = cb.shape
    if n_codes == 0:                        # empty codebook: empty index
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_column: pa.array([], pa.int64()),
                         "adc": pa.array([], pa.float64())})
    q = np.asarray(queries, dtype=np.float64)
    # dtables[qi, s, c] = ||q_sub - centroid||^2
    dtables = ((q.reshape(len(q), m, 1, dsub)
                - cb[None]) ** 2).sum(-1)          # (Q, m, K)

    def scan(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False
                                               ).astype(np.int64)
        codes = np.asarray(batch.column("codes").combine_chunks()
                           .flatten().to_numpy(zero_copy_only=False)
                           ).reshape(len(ids), m)
        out_q, out_i, out_d = [], [], []
        sub = np.arange(m)[None, :]
        for qi in range(len(q)):
            d = dtables[qi][sub, codes].sum(axis=1)
            order = np.lexsort((ids, d))[:k]
            out_q.append(np.full(order.size, qi, np.int64))
            out_i.append(ids[order])
            out_d.append(d[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            id_column: pa.array(np.concatenate(out_i), pa.int64()),
            "adc": pa.array(np.concatenate(out_d), pa.float64()),
        })

    cands = codes_ds.map_batches(scan, batch_format="pyarrow",
                                 batch_size=batch_size,
                                 runtime_env=package_runtime_env())
    return _merge_adc_topk(cands, id_column, k)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse clusters + residual PQ codes (the FAISS IVFPQ shape)
# ---------------------------------------------------------------------------

def ivfpq_build(ds, *, n_clusters: int = 16, m: int = 16, n_codes: int = 256,
                sample_size: int = 2048, vec_column: str = "embedding",
                id_column: str = "vec_id", seed: int = 7,
                concurrency: int = 2):
    """Coarse k-means + product quantization of the RESIDUALS
    (v - centroid[cluster]) — residuals are far more compressible than raw
    vectors because the coarse step removes the cluster mean.  Returns
    ``(centroids, codebooks, coded)`` where ``coded`` has columns
    ``(<id_column>, cluster, codes)``.

    At 100 TB ``coded`` writes as cluster-partitioned Parquet of
    ``m``-byte rows (ivf_write_partitioned's layout, 8*dim/m smaller):
    a query reads only ``nprobe`` partitions of codes, never a float."""
    # ONE head read seeds both the coarse centroids and, via residuals,
    # the PQ codebooks (review finding: ivf_build used to re-draw it)
    sample = _sample_matrix(ds, vec_column, sample_size)
    cent, assigned = ivf_build(ds, n_clusters=n_clusters,
                               sample_size=sample_size,
                               vec_column=vec_column, id_column=id_column,
                               seed=seed, concurrency=concurrency,
                               sample=sample)
    sample = _normalize(sample)                 # assignment space
    if sample.shape[0]:
        res = sample - cent[np.argmax(sample @ cent.T, axis=1)]
    else:                                       # empty input: no residuals
        res = np.zeros((0, m), np.float64)      # keeps dim % m == 0
    cb = pq_train(res, m=m, n_codes=n_codes, seed=seed)

    def encode(batch: pa.Table) -> pa.Table:
        cl = batch.column("cluster").to_numpy(zero_copy_only=False
                                              ).astype(np.int64)
        v = _as_matrix(batch.column("nvec"))     # already normalized
        r = v - cent[cl] if len(v) else v
        codes = _pq_assign_codes(r, cb)
        return pa.table({
            id_column: batch.column(id_column),
            "cluster": batch.column("cluster"),
            "codes": pa.array(codes.tolist(),
                              pa.list_(pa.uint8(), cb.shape[0])),
        })

    coded = assigned.map_batches(encode, batch_format="pyarrow",
                                 runtime_env=package_runtime_env())
    return cent, cb, coded


def ivfpq_topk(coded, centroids: np.ndarray, codebooks: np.ndarray,
               queries: np.ndarray, k: int = 10, *, nprobe: int = 4,
               id_column: str = "vec_id", batch_size: int = 8192):
    """ADC top-k over residual codes, restricted to each query's ``nprobe``
    nearest coarse clusters.  The residual distance table is PER PROBED
    CLUSTER: ``d(q, v) ~= sum_s ||(q - c)_sub - codebook[s, code]||^2``.
    Queries are L2-normalized (the assignment space); adc ascending,
    ties on id — same merge shape as pq_topk."""
    cent = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = cb.shape
    if cent.shape[0] == 0 or n_codes == 0:   # empty index: nothing matches
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_column: pa.array([], pa.int64()),
                         "adc": pa.array([], pa.float64())})
    q = _normalize(np.asarray(queries, dtype=np.float64))
    nprobe = min(nprobe, cent.shape[0])
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]   # (Q, nprobe)
    # dtables[qi, p, s, c] for the p-th probed cluster of query qi
    resq = q[:, None, :] - cent[probes]                      # (Q, np, dim)
    dtables = ((resq.reshape(len(q), nprobe, m, 1, dsub)
                - cb[None, None]) ** 2).sum(-1)              # (Q, np, m, K)

    def scan(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False
                                               ).astype(np.int64)
        cl = batch.column("cluster").to_numpy(zero_copy_only=False
                                              ).astype(np.int64)
        codes = np.asarray(batch.column("codes").combine_chunks()
                           .flatten().to_numpy(zero_copy_only=False)
                           ).reshape(len(ids), m)
        out_q, out_i, out_d = [], [], []
        sub = np.arange(m)[None, :]
        for qi in range(len(q)):
            sel_all = np.isin(cl, probes[qi])
            if not sel_all.any():
                continue
            idx = np.nonzero(sel_all)[0]
            # probe slot of each selected row's cluster for this query:
            # order_p maps sorted-probe position -> probe slot, so
            # slot[p] satisfies probes[qi][slot] == cl[idx]
            order_p = np.argsort(probes[qi])
            slot = order_p[np.searchsorted(probes[qi][order_p], cl[idx])]
            d = dtables[qi][slot[:, None], sub, codes[idx]].sum(axis=1)
            order = np.lexsort((ids[idx], d))[:k]
            out_q.append(np.full(order.size, qi, np.int64))
            out_i.append(ids[idx][order])
            out_d.append(d[order])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_column: pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            id_column: pa.array(np.concatenate(out_i), pa.int64()),
            "adc": pa.array(np.concatenate(out_d), pa.float64()),
        })

    cands = coded.map_batches(scan, batch_format="pyarrow",
                              batch_size=batch_size,
                              runtime_env=package_runtime_env())
    return _merge_adc_topk(cands, id_column, k)


# ---------------------------------------------------------------------------
# per-label centroids (class prototypes / nearest-class-mean)
# ---------------------------------------------------------------------------

def label_centroids(ds, *, vec_column: str = "embedding",
                    label_column: str = "label"):
    """Mean embedding per label — class prototypes for nearest-class-mean
    classification, prototype-based curation, and embedding-quality checks.

    Scale shape: a stateless ``map_batches`` reduces each batch to one
    ``(label, n, sum-vector)`` row per label present (vectorized per-label
    matmul-free segment sum), so the ``groupby(label)`` exchange moves
    O(num_blocks * num_labels) rows, never the corpus.  Returns LONG form
    ``(label, i, mu)`` with ``i`` 1-based — the layout a SQL oracle can
    replay via unnest + group by."""

    def partial(batch: pa.Table) -> pa.Table:
        v = _as_matrix(batch.column(vec_column))
        lab = batch.column(label_column).to_numpy(zero_copy_only=False
                                                  ).astype(np.int64)
        if not len(lab):
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "vsum": pa.array([], pa.list_(pa.float64()))})
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((uniq.size, v.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, v)
        counts = np.bincount(inv, minlength=uniq.size)
        return pa.table({
            "label": pa.array(uniq, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
            "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           runtime_env=package_runtime_env())

    def combine(g: pa.Table) -> pa.Table:
        s = _as_matrix(g.column("vsum")).sum(axis=0)
        n = int(g.column("n").to_numpy(zero_copy_only=False).sum())
        lab = g.column("label")[0].as_py()
        mu = s / n
        return pa.table({
            "label": pa.array([lab] * mu.size, pa.int64()),
            "i": pa.array(np.arange(1, mu.size + 1), pa.int64()),
            "mu": pa.array(mu, pa.float64()),
        })

    return parts.groupby("label").map_groups(
        combine, batch_format="pyarrow", runtime_env=package_runtime_env())


# ---------------------------------------------------------------------------
# embedding quantization (int8 storage/serving format)
# ---------------------------------------------------------------------------

def quantize_embeddings(ds, *, vec_column: str = "embedding",
                        id_column: str = "vec_id", flatten: bool = False):
    """Symmetric per-vector int8 quantization: ``scale = max(|x|)`` and
    ``q_i = floor(x_i * 127 / scale + 0.5)`` (half-away rounding — exactly
    DuckDB ``floor(v * 127.0 / scale + 0.5)``, never numpy's banker's
    round).  4x smaller vectors with a per-vector scale for dequantize
    (``x ≈ q * scale / 127``) — the standard storage/serving layout for
    billion-vector ANN corpora.

    Output (``flatten=False``, the production layout): one row per vector,
    ``(<id_column>, qvec list<int8>, scale float64)``.  With
    ``flatten=True``: one row per dimension ``(<id_column>, dim_idx, q,
    scale)`` — every quantized value individually SQL-checkable (the
    driver-entry form; list columns don't hash portably).

    Scale shape: stateless vectorized map_batches — no shuffle, no state;
    all-zero vectors quantize to zeros under a clamped scale (1e-30), not
    NaN.  Cast to float64 BEFORE the scale math so Python and SQL see the
    same doubles (the input column is float32)."""
    def quantize(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            if flatten:
                return pa.table({
                    id_column: pa.array([], pa.int64()),
                    "dim_idx": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                    "scale": pa.array([], pa.float64())})
            return pa.table({
                id_column: pa.array([], pa.int64()),
                "qvec": pa.array([], pa.list_(pa.int8())),
                "scale": pa.array([], pa.float64())})
        m = _as_matrix(batch.column(vec_column))
        d = m.shape[1]
        scale = np.maximum(np.abs(m).max(axis=1), 1e-30)
        q = np.floor(m * 127.0 / scale[:, None] + 0.5)
        ids = batch.column(id_column).cast(pa.int64())
        if flatten:
            return pa.table({
                id_column: pa.array(np.repeat(
                    ids.to_numpy(zero_copy_only=False), d), pa.int64()),
                "dim_idx": pa.array(np.tile(np.arange(d, dtype=np.int64), n),
                                    pa.int64()),
                "q": pa.array(q.ravel().astype(np.int64), pa.int64()),
                "scale": pa.array(np.repeat(scale, d), pa.float64())})
        qvec = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
            pa.array(q.ravel().astype(np.int8), pa.int8()))
        return pa.table({id_column: ids,
                         "qvec": qvec,
                         "scale": pa.array(scale, pa.float64())})

    from trinity_ray.rayutil import package_runtime_env

    return ds.map_batches(quantize, batch_format="pyarrow",
                          runtime_env=package_runtime_env())


def dequantize_matrix(qvec: pa.ChunkedArray | pa.Array,
                      scale: np.ndarray) -> np.ndarray:
    """(N, D) float64 from a quantized list<int8> column + per-vector
    scales — the serving-side inverse (``q * scale / 127``)."""
    if isinstance(qvec, pa.ChunkedArray):
        qvec = qvec.combine_chunks()
    flat = qvec.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(qvec)
    m = flat.reshape(n, -1) if n else flat.reshape(0, 0)
    return m * (np.asarray(scale, np.float64)[:, None] / 127.0)


# ---------------------------------------------------------------------------
# hard-negative mining (contrastive-training data)
# ---------------------------------------------------------------------------

def hard_negatives(ds, queries: np.ndarray, query_ids, query_labels,
                   k: int = 5, *, vec_column: str = "embedding",
                   id_column: str = "vec_id", label_column: str = "label",
                   batch_size: int = 4096, concurrency: int = 2):
    """Mine the ``k`` nearest DIFFERENT-label corpus vectors for each
    query — hard negatives for contrastive/triplet training.  Returns
    (query_id, <id_column>, cosine, rank), rank 1-based by
    (cosine desc, id asc); query_id carries the caller's ``query_ids``
    values.  A thin seam over :func:`brute_force_topk`'s label-mask mode
    (one scan kernel, defined once).

    Scale shape: the query matrix broadcasts once (actor ``__init__``);
    each corpus batch pays one matmul + a label mask; per-batch top-k
    candidates (k x blocks rows) merge on the driver.  At 100-TB corpus
    scale swap the scan for :func:`ivf_topk_partitioned`'s probed-
    partition read (same candidate/merge contract) — mining quality only
    needs NEAR negatives, which live in the probed clusters by
    construction.

    Rank/cos exposure caveat (same as the other ann_* oracles): near-tie
    candidates whose cosines differ below float64 evaluation-order noise
    could rank differently in SQL; the synthetic corpora carry no such
    ties."""
    qids = np.asarray(query_ids, dtype=np.int64)
    t = brute_force_topk(ds, queries, k=k, vec_column=vec_column,
                         id_column=id_column, query_ids=qids,
                         query_labels=query_labels,
                         label_column=label_column,
                         batch_size=batch_size, concurrency=concurrency)
    if t.num_rows == 0:
        return t.append_column("rank", pa.array([], pa.int64()))
    qix = t.column("query_id").to_numpy()
    # per-query 1-based rank: brute_force_topk already emits each query's
    # rows merged in (cosine desc, id asc) order
    counts = np.bincount(qix, minlength=len(qids))
    rank = np.concatenate([np.arange(1, c + 1, dtype=np.int64)
                           for c in counts if c > 0])
    return pa.table({
        "query_id": pa.array(qids[qix], pa.int64()),
        id_column: t.column(id_column),
        "cosine": t.column("cosine"),
        "rank": pa.array(rank, pa.int64())})
