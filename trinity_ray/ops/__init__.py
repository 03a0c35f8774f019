"""Training-data-pipeline operators over Ray Data Datasets.

Beyond the reference's IR operators, these are the large-scale
training-data-pipeline stages the task brief requires as first-class
components: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine, SemDeDup cluster-then-prune, incremental-vs-history —
``dedup``), similarity search (brute-force, IVF, cluster-partitioned
IVF, PQ/ADC, IVF-PQ, per-label centroids — ``ann``), text analysis
(language-ID, quality, token counting, fingerprinting, PII scrubbing,
keywords, collocations — ``text``), multimodal column plumbing,
relational/event operators Ray Data lacks (as-of and range joins,
grouped top-k, exact and sampled grouped quantiles — ``relational``),
event-time windows, sessionization and retention cohorts (``window``),
mergeable sketches (HyperLogLog, Misra-Gries — ``sketch``),
deterministic sampling, epoch shuffling, mixture reweighting and
token-budget trimming (``sample``), sequence packing and fixed/sliding
window chunking (``pack``), benchmark decontamination (``decontam``),
and Arrow-native JSON extraction (``jsonx``).

All operators take and return ``ray.data.Dataset`` and never call
``ray.init()``.
"""
