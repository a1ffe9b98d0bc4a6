"""Large-scale training-data pipeline operators.

Beyond the reference's surface (per ``BASELINE.json``'s north star):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search over embeddings, text analysis, and multimodal column
plumbing — all DataFrame-native and designed for 100 TB inputs.
"""
