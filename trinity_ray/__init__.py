"""trinity_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the *capabilities* of phaistos-networks/Trinity
(reference at /root/reference, C++ IR library) on Ray Data + Arrow + numpy:

- tokenize source code into terms (``trinity_ray.tokenizer``)
- build per-partition compressed posting-list segments
  (``trinity_ray.index.build``), codec in ``trinity_ray.codec``
- merge segments into a global index via a groupby(term) shuffle
  (``trinity_ray.index.merge``)
- answer boolean AND/OR/NOT + phrase queries with BM25 top-k
  (``trinity_ray.query``, ``trinity_ray.search``)
- training-data-pipeline operators: dedup, similarity search, text analysis
  (``trinity_ray.ops``)

Nothing in this package calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.3.0"

# Public API (lazy imports so `import trinity_ray` stays light; heavy deps
# like ray.data load only when the symbols are used).
_EXPORTS = {
    "build_index": ("trinity_ray.index.build", "build_index"),
    "merge_index": ("trinity_ray.index.merge", "merge_index"),
    "delete_docs": ("trinity_ray.index.merge", "delete_docs"),
    "retire_superseded": ("trinity_ray.index.merge", "retire_superseded"),
    "LocalSearcher": ("trinity_ray.search", "LocalSearcher"),
    "RaySearcher": ("trinity_ray.search", "RaySearcher"),
    "batch_search": ("trinity_ray.search", "batch_search"),
    "parse_query": ("trinity_ray.query.ast", "parse_query"),
    "rewrite_query": ("trinity_ray.query.rewrite", "rewrite_query"),
    "percolate": ("trinity_ray.ops.percolate", "percolate"),
    "get_tokenizer": ("trinity_ray.tokenizer", "get_tokenizer"),
    # round 2: NRT source, codec seam, payloads, scale ANN, image codecs
    "LiveIndex": ("trinity_ray.index.live", "LiveIndex"),
    "CODECS": ("trinity_ray.codec", "CODECS"),
    "encode_png": ("trinity_ray.ops.imagecodec", "encode_png"),
    "decode_png": ("trinity_ray.ops.imagecodec", "decode_png"),
    "encode_bmp": ("trinity_ray.ops.imagecodec", "encode_bmp"),
    "decode_bmp": ("trinity_ray.ops.imagecodec", "decode_bmp"),
    "ivf_write_partitioned": ("trinity_ray.ops.ann", "ivf_write_partitioned"),
    "ivf_topk_partitioned": ("trinity_ray.ops.ann", "ivf_topk_partitioned"),
    # round 3: storage-aware doc predicates, in-place compaction,
    # corpus curation (sampling / decontamination / vocab / export)
    "DocPredicate": ("trinity_ray.query.exec", "DocPredicate"),
    "plan_compaction": ("trinity_ray.index.merge", "plan_compaction"),
    "compact_segments": ("trinity_ray.index.merge", "compact_segments"),
    "sample_by_hash": ("trinity_ray.ops.sample", "sample_by_hash"),
    "stratified_sample": ("trinity_ray.ops.sample", "stratified_sample"),
    "decontaminate": ("trinity_ray.ops.decontam", "decontaminate"),
    "top_terms": ("trinity_ray.ops.text", "top_terms"),
    "repetition_stats": ("trinity_ray.ops.text", "repetition_stats"),
    "export_curated": ("trinity_ray.pipelines.export", "export_curated"),
    "export_packed": ("trinity_ray.pipelines.export", "export_packed"),
    "stage_corpus": ("trinity_ray.sources", "stage_corpus"),
    # round 5 (final session): relational/event operators Ray Data lacks,
    # sketches, semi-structured extraction
    "asof_join": ("trinity_ray.ops.relational", "asof_join"),
    "range_count_join": ("trinity_ray.ops.relational", "range_count_join"),
    "grouped_top_k": ("trinity_ray.ops.relational", "grouped_top_k"),
    "grouped_quantile_disc": ("trinity_ray.ops.relational",
                              "grouped_quantile_disc"),
    "grouped_quantile_sample": ("trinity_ray.ops.relational",
                                "grouped_quantile_sample"),
    "sample_exact_k": ("trinity_ray.ops.sample", "sample_exact_k"),
    "epoch_shuffle": ("trinity_ray.ops.sample", "epoch_shuffle"),
    "upsample": ("trinity_ray.ops.sample", "upsample"),
    "pack_sequences": ("trinity_ray.ops.pack", "pack_sequences"),
    "dedup_lines": ("trinity_ray.ops.dedup", "dedup_lines"),
    "lm_surprisal": ("trinity_ray.ops.text", "lm_surprisal"),
    "bpe_train": ("trinity_ray.ops.text", "bpe_train"),
    "bpe_encode": ("trinity_ray.ops.text", "bpe_encode"),
    "normalize_text": ("trinity_ray.ops.text", "normalize_text"),
    "mixture_weights": ("trinity_ray.ops.sample", "mixture_weights"),
    "extract_json": ("trinity_ray.ops.jsonx", "extract_json"),
    "heavy_hitters": ("trinity_ray.ops.sketch", "heavy_hitters"),
    "MisraGries": ("trinity_ray.ops.sketch", "MisraGries"),
    "hll_distinct": ("trinity_ray.ops.sketch", "hll_distinct"),
    "tumbling_window": ("trinity_ray.ops.window", "tumbling_window"),
    "hopping_window": ("trinity_ray.ops.window", "hopping_window"),
    "sessionize": ("trinity_ray.ops.window", "sessionize"),
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str):
    try:
        mod, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module 'trinity_ray' has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(mod), attr)
