"""Corpus cleaning: the canonical 100-TB training-data pipeline as ONE
composition of the engine's operators —

    exact dedup (md5, keep lowest id)
      -> near-dup removal (MinHash LSH candidates, exact n-gram Jaccard
         verify, drop the higher id of each verified pair)
      -> quality gate (word count)
      -> language gate (stopword-profile lang id)

Every stage is the already-verified operator (each has its own exact
DuckDB oracle), so the COMPOSITION is exactly SQL-checkable end to end —
the driver entry ``clean_corpus`` hash-matches a single DuckDB query.

Scale shape: the only all-to-all exchanges are the ones inside the dedup
stages (hash aggregate + banded-LSH bucket groupby); every filter is a
broadcast-set ``map_batches``; nothing materializes the corpus on the
driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from trinity_ray.rayutil import package_runtime_env


def clean_corpus(ds, *, id_column: str = "doc_id",
                 text_column: str = "text", jaccard_threshold: float = 0.6,
                 min_words: int = 5, lang: str = "en",
                 keep_columns: tuple = ()):
    """Returns the cleaned Dataset with (id, n_words, lang_pred) columns,
    plus any ``keep_columns`` carried through (e.g. the text itself for a
    curated-training-data export — the default stays metadata-only for
    the oracle entry)."""
    import ray

    from trinity_ray.ops.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        verify_pairs_jaccard,
    )
    from trinity_ray.ops.text import lang_id, quality_score

    d1 = exact_dedup(ds, id_column=id_column, text_column=text_column)
    # exact_dedup re-derives from ds on each consumption; pin the winners
    # so the near-dup scan and the final filter read one materialization
    d1 = d1.materialize()
    # bands=32 (r=2 rows/band over 64 perms): candidate-miss probability
    # at the 0.6 verify threshold is (1-0.36)^32 ~= 6e-7 — the default
    # r=8 banding missed real j=0.8 pairs at corpus scale (recall at
    # j=0.8 is only ~77% per pair with r=8)
    cands = minhash_lsh_pairs(d1, id_column=id_column, bands=32,
                              text_column=text_column, threshold=0.3,
                              max_bucket=2000)
    ver = verify_pairs_jaccard(cands, d1, id_column=id_column,
                               text_column=text_column,
                               threshold=jaccard_threshold)
    losers = np.unique(np.asarray(ver["id_b"], dtype=np.int64)) \
        if len(ver) else np.empty(0, np.int64)
    losers_ref = ray.put(losers)

    def drop_near_dups(batch: pa.Table) -> pa.Table:
        lo = ray.get(losers_ref)
        ids = batch.column(id_column).to_numpy().astype(np.int64)
        return batch.filter(pa.array(~np.isin(ids, lo)))

    d2 = d1.map_batches(drop_near_dups, batch_format="pyarrow",
                        runtime_env=package_runtime_env())
    d3 = quality_score(d2, text_column=text_column).filter(
        expr=f"n_words >= {min_words}")
    d4 = lang_id(d3, text_column=text_column).filter(
        expr=f"lang_pred == '{lang}'")
    extra = [c for c in keep_columns
             if c not in (id_column, "n_words", "lang_pred")]
    return d4.select_columns([id_column, "n_words", "lang_pred", *extra])
