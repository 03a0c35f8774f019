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

__version__ = "0.1.0"
