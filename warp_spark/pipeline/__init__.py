"""Large-scale training-data pipeline operators — the capabilities a
100 TB LLM data pipeline needs beyond the reference's surface:

- deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard,
  embedding-cosine, winnowed rolling-hash partial overlap; connected
  components via min-label propagation or large-star/small-star;
- similarity search: exact brute-force / blocked-matmul all-pairs,
  IVF, multi-table multi-probe LSH (top-k and corpus×corpus join),
  product quantization (ADC scoring + exact shortlist re-rank);
- text analysis: language-ID, quality scoring, repetition/boilerplate
  signals, TF-IDF top terms, PII scrubbing, token counting,
  fingerprinting;
- benchmark decontamination: distinct token-n-gram overlap of the
  training corpus against a broadcast eval-set gram set (the
  GPT-3/PaLM 13-gram check);
- multimodal column plumbing: image decode/resize, video frame
  sampling, audio features (codecs stubbed, plumbing real).

All operators are declarative DataFrame compositions (JVM-side) except
the designed Arrow tiers — SimHash/MinHash signatures, winnowing
hashes, LSH bucket codes, blocked cosine matmuls, multimodal decode
(pandas UDF / applyInPandas / mapInPandas) — and every one partitions
cleanly with no hot-path driver collects.
"""
