"""Approximate-nearest-neighbor search over embedding columns.

- ``bruteforce`` — exact cosine top-k via broadcast cross join +
  window rank; the baseline and the small-query-set workhorse.
- ``lsh``        — random-hyperplane LSH bucketing; candidates only
  join within a bucket (multi-probe via bit flips), the 100 TB path.
"""
