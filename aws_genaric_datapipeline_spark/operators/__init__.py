"""Analytics operator library beyond plain relational ops.

- ``text``       — tokenization, shingling, language-ID, quality scoring,
                   fingerprinting (all JVM-side expressions).
- ``dedup``      — exact, content-hash, n-gram Jaccard, MinHash-LSH, SimHash.
- ``similarity`` — embedding cosine top-k (brute force) and LSH-bucketed ANN.
- ``multimodal`` — binary media columns: schema, batch plumbing, stubbed
                   decoders behind mapInPandas.
"""
