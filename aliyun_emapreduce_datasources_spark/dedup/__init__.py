"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all shuffle-conscious:

- ``exact``      — hash-groupBy on content digest; one shuffle on the
                   digest, no pairwise comparisons.
- ``ngram``      — blocked shingle-Jaccard pairwise near-dup (exact
                   answer within blocks; DuckDB-oracle-checkable).
- ``minhash``    — MinHash signatures + LSH banding: candidate pairs
                   only collide within a band bucket, so the shuffle
                   is O(docs × bands), never O(docs²).
- ``simhash``    — 64-bit SimHash + band-exact candidate generation
                   for small-Hamming-distance near-dups.
- ``embedding``  — cosine near-dup over embedding vectors via random
                   hyperplane LSH bucketing.
"""
