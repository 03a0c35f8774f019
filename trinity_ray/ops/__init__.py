"""Training-data-pipeline operators over Ray Data Datasets.

Beyond the reference's IR operators, these are the large-scale
training-data-pipeline stages the task brief requires as first-class
components: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + IVF), text analysis
(language-ID, quality, token counting, fingerprinting), and multimodal
column plumbing.

All operators take and return ``ray.data.Dataset`` and never call
``ray.init()``.
"""
