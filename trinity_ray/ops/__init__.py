"""Training-data-pipeline operators over Ray Data Datasets.

Beyond the reference's IR operators, these are the large-scale
training-data-pipeline stages the task brief requires as first-class
components: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + IVF), text analysis
(language-ID, quality, token counting, fingerprinting), multimodal
column plumbing, relational/event operators Ray Data lacks (as-of and
range joins, grouped top-k, exact and sampled grouped quantiles —
``relational``), event-time windows and sessionization (``window``),
mergeable sketches (HyperLogLog, Misra-Gries — ``sketch``),
deterministic sampling (``sample``), and Arrow-native JSON extraction
(``jsonx``).

All operators take and return ``ray.data.Dataset`` and never call
``ray.init()``.
"""
