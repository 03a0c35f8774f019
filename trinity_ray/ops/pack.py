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

__all__ = ["chunk_documents"]


def chunk_documents(ds, vocab, *, seq_len: int = 128,
                    text_column: str = "text", id_column: str = "doc_id",
                    tokenizer: str = "simple", unk_id: int = 0):
    """Per-document fixed-length token-id windows.

    ``vocab``: list of terms (rank order; id = index + 1) or an explicit
    term -> id dict; out-of-vocabulary tokens map to ``unk_id``.  Output
    rows: (id_column, chunk_idx, n_tokens, checksum) where ``checksum`` =
    sum over the chunk of (1-based position within chunk) * token_id —
    order-sensitive, integer-exact, so an oracle can verify the full
    tokenize -> vocab-id -> window math without comparing id lists.
    Empty documents emit no rows (they have no windows)."""
    import ray

    if not isinstance(vocab, dict):
        vocab = {t: i + 1 for i, t in enumerate(vocab)}
    vref = ray.put(vocab)
    tok = get_tokenizer(tokenizer)
    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")

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
            starts = np.arange(0, n, L)
            weighted = (np.arange(n, dtype=np.int64) % L + 1) * ids
            out_d.append(np.full(starts.size, int(d), np.int64))
            out_ci.append(starts // L)
            out_n.append(np.minimum(L, n - starts))
            out_ck.append(np.add.reduceat(weighted, starts))
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
