"""Relational and data-pipeline operators.

- ``text``       — language-ID, quality scoring, token counting, fingerprints
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard dedup
- ``similarity`` — embedding cosine top-k (brute force + LSH-bucketed)
- ``candidates`` — scale-out candidate grid + ResponseFinalizer (W9)
"""

from phoebe_spark.operators import candidates, dedup, sampling, similarity, text  # noqa: F401
