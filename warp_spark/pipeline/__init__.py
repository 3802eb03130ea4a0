"""Large-scale training-data pipeline operators — the capabilities a
100 TB LLM data pipeline needs beyond the reference's surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal column plumbing.

All operators are declarative DataFrame compositions (JVM-side) except
SimHash (Arrow-vectorized pandas UDF) and the multimodal decode stub
(mapInPandas) — every one partitions cleanly and avoids driver-side
collects.
"""
