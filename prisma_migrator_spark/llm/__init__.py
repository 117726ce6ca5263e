"""LLM-training-data pipeline extensions (SURVEY §7.2 M5, north star).

Beyond reference parity: the operator families a 100 TB training-data
pipeline needs — dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (tokens, quality, language-ID, fingerprints), and
multimodal binary-column plumbing.

All built on DataFrame ops + built-in functions; Pandas UDFs only
where Spark genuinely lacks the operator (multimodal decode).
"""
