"""End-to-end pipelines wired for the driver testdata tables.

``docsearch`` exposes one callable per implemented operator (the
``__ray_entry__.queries()`` surface): index build + BM25 search over the
``documents`` table, delete/merge variants, dedup / text-analysis /
similarity-search / multimodal operators.
"""
