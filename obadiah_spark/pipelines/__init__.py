"""LLM-training-data pipeline operators over the ``documents`` and
``embeddings`` tables: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard), text analysis, similarity search (brute-force + LSH ANN), and
multimodal binary-column plumbing.

These are first-class engine operators (not demos): every SQL-expressible one
has a DuckDB oracle in the driver gate; the approximate ones carry
self-consistency tests (LSH recall vs brute force) instead.
"""
