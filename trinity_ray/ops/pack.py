"""Training-data sequence preparation: token-id chunking.

The last mile before a training job is turning documents into
fixed-length token-id windows.  ``chunk_documents`` maps each document's
(filtered) token stream through a broadcast vocabulary and chunks it into
``seq_len`` windows (the per-document variant — embarrassingly parallel;
cross-document packing is a per-shard concatenation of these windows plus
an EOS policy and inherits the same math).

Scale shape: the vocabulary is built once (`ops.text.top_terms`, a
vocabulary-sized shuffle) and broadcast via ``ray.put``; chunking itself
is a stateless ``map_batches`` — no shuffle, no driver materialization.
Each output row carries scalar per-chunk facts (count + an
order-sensitive checksum) so the whole tokenize→id→window path is
SQL-checkable without shipping token-id lists through the compare.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from trinity_ray.rayutil import package_runtime_env
from trinity_ray.tokenizer import get_tokenizer

__all__ = ["chunk_documents", "pack_sequences"]


def chunk_documents(ds, vocab, *, seq_len: int = 128, stride: int | None = None,
                    text_column: str = "text", id_column: str = "doc_id",
                    tokenizer: str = "simple", unk_id: int = 0):
    """Per-document fixed-length token-id windows.

    ``vocab``: list of terms (rank order; id = index + 1) or an explicit
    term -> id dict; out-of-vocabulary tokens map to ``unk_id``.  Output
    rows: (id_column, chunk_idx, n_tokens, checksum) where ``checksum`` =
    sum over the chunk of (1-based position within chunk) * token_id —
    order-sensitive, integer-exact, so an oracle can verify the full
    tokenize -> vocab-id -> window math without comparing id lists.
    Empty documents emit no rows (they have no windows).

    ``stride`` (default ``seq_len``): window start spacing.  A stride
    below ``seq_len`` yields OVERLAPPING windows — the RAG-retrieval
    chunking layout where each chunk shares ``seq_len - stride`` tokens
    with its predecessor; chunk_idx counts strides, and the checksum
    stays per-chunk-relative (computed via two prefix sums, so overlap
    costs O(n + n_chunks), not O(n_chunks * seq_len))."""
    import ray

    if not isinstance(vocab, dict):
        vocab = {t: i + 1 for i, t in enumerate(vocab)}
    vref = ray.put(vocab)
    tok = get_tokenizer(tokenizer)
    L = int(seq_len)
    S = L if stride is None else int(stride)
    if L <= 0 or S <= 0:
        raise ValueError("seq_len and stride must be positive")

    def chunks(batch: pa.Table) -> pa.Table:
        v = ray.get(vref)
        get = v.get
        out_d, out_ci, out_n, out_ck = [], [], [], []
        for d, t in zip(batch.column(id_column).to_pylist(),
                        batch.column(text_column).to_pylist()):
            toks = tok(t or "")
            n = len(toks)
            if n == 0:
                continue
            ids = np.fromiter((get(x, unk_id) for x in toks),
                              dtype=np.int64, count=n)
            starts = np.arange(0, n, S)
            ends = np.minimum(starts + L, n)
            # checksum(s) = sum_{j in [s, e)} (j - s + 1) * ids[j]
            #            = (A[e] - A[s]) - s * (B[e] - B[s])
            pw = np.concatenate(([0], np.cumsum(
                (np.arange(n, dtype=np.int64) + 1) * ids)))
            ps = np.concatenate(([0], np.cumsum(ids)))
            out_d.append(np.full(starts.size, int(d), np.int64))
            out_ci.append(starts // S)
            out_n.append(ends - starts)
            out_ck.append((pw[ends] - pw[starts])
                          - starts * (ps[ends] - ps[starts]))
        if not out_d:
            return pa.table({
                id_column: pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "checksum": pa.array([], pa.int64()),
            })
        return pa.table({
            id_column: pa.array(np.concatenate(out_d), pa.int64()),
            "chunk_idx": pa.array(np.concatenate(out_ci), pa.int64()),
            "n_tokens": pa.array(np.concatenate(out_n), pa.int64()),
            "checksum": pa.array(np.concatenate(out_ck), pa.int64()),
        })

    return ds.map_batches(chunks, batch_format="pyarrow",
                          runtime_env=package_runtime_env())


def pack_sequences(ds, *, seq_len: int = 256, text_column: str = "text",
                   id_column: str = "doc_id", tokenizer: str = "simple",
                   range_span: int = 4096):
    """Cross-document concat-and-split sequence packing.

    The standard pre-training layout: every document's token stream is
    concatenated in ascending ``id_column`` order and the global stream is
    cut into fixed ``seq_len`` training sequences.  Output: one row per
    (sequence, document) overlap — ``(seq_id, <id_column>, n_tokens)``
    where ``n_tokens`` is how many of the document's tokens land in that
    sequence.  Summing per document recovers its token count; summing per
    sequence gives exactly ``seq_len`` everywhere but the tail.  Documents
    with zero tokens emit no rows (and shift no offsets).

    Scale shape — the distributed prefix-sum pattern:

    1. a stateless ``map_batches`` counts tokens per document;
    2. a count-only ``groupby(range_id).sum`` whose result (one row per
       id-range of ``range_span`` consecutive ids — NOT per document)
       reaches the driver for the exclusive prefix sum and is broadcast
       back once via ``ray.put``;
    3. ``groupby(range_id).map_groups`` sorts each bounded range by id,
       adds the broadcast range offset to a local cumulative sum, and
       emits the per-sequence overlap rows fully vectorized.

    Only O(#ranges) rows ever reach the driver, every heavy stage streams,
    and group size is bounded by ``range_span`` documents.  Partitioning
    assumption (documented per the custom-operator rule): ``id_column`` is
    an integer; packing order is ascending id.
    """
    import ray

    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")
    span = int(range_span)
    if span <= 0:
        raise ValueError("range_span must be positive")
    tok = get_tokenizer(tokenizer)

    def counts(batch: pa.Table) -> pa.Table:
        # count-only tokenize (TokenCounter would also run its unused
        # BPE-ish second regex pass over every document)
        n = np.fromiter((len(tok(t or ""))
                         for t in batch.column(text_column).to_pylist()),
                        dtype=np.int64, count=batch.num_rows)
        ids = batch.column(id_column).cast(pa.int64()
                                           ).to_numpy(zero_copy_only=False)
        keep = n > 0
        ids, n = ids[keep], n[keep]
        return pa.table({id_column: pa.array(ids, pa.int64()),
                         "range_id": pa.array(ids // span, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    # two consumers (range totals + the packing groupby) read the counts:
    # materialize the REDUCED table (3 int64 columns, ~24 B/doc vs the
    # multi-KB text rows) so tokenization — the expensive stage — runs
    # once; the object store spills it if it outgrows memory
    cnt_ds = ds.map_batches(counts, batch_format="pyarrow",
                            runtime_env=package_runtime_env()).materialize()
    # one row per id-range: vocabulary-sized, never per-document
    from trinity_ray.rayutil import exclusive_prefix_offsets

    offsets = exclusive_prefix_offsets(
        cnt_ds.groupby("range_id").sum("n").to_pandas(), "range_id", "sum(n)")
    off_ref = ray.put(offsets)

    def pack_group(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        ids = group.column(id_column).to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        rid = int(ids[0]) // span
        s = int(offs[rid]) + np.concatenate(
            ([0], np.cumsum(n[:-1], dtype=np.int64)))
        e = s + n
        k_lo, k_hi = s // L, (e - 1) // L
        counts_per_doc = k_hi - k_lo + 1
        total = int(counts_per_doc.sum())
        idx = np.arange(total, dtype=np.int64)
        base = np.concatenate(([0], np.cumsum(counts_per_doc[:-1],
                                              dtype=np.int64)))
        within = idx - np.repeat(base, counts_per_doc)
        ks = np.repeat(k_lo, counts_per_doc) + within
        s_rep = np.repeat(s, counts_per_doc)
        e_rep = np.repeat(e, counts_per_doc)
        n_in = (np.minimum(e_rep, (ks + 1) * L)
                - np.maximum(s_rep, ks * L))
        return pa.table({
            "seq_id": pa.array(ks, pa.int64()),
            id_column: pa.array(np.repeat(ids, counts_per_doc), pa.int64()),
            "n_tokens": pa.array(n_in, pa.int64()),
        })

    return cnt_ds.groupby("range_id").map_groups(
        pack_group, batch_format="pyarrow")
