"""Relational and data-pipeline operators.

- ``text``       — language-ID, quality scoring, token counting,
                   fingerprints, BPE tokenizer training
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard,
                   winnowing, components, decontamination
- ``similarity`` — embedding cosine top-k (brute force + LSH-bucketed +
                   IVF), all-pairs GEMM, quantization
- ``candidates`` — scale-out candidate grid + ResponseFinalizer (W9)
- ``sampling``   — hash split/sample, stratified + weighted sampling
- ``curation``   — quality rules, repetition, packing, mixture weights
- ``skyline``    — 2D Pareto-frontier preference queries
- ``skew``       — salted aggregation / salted broadcast join
- ``multimodal`` — binary media columns: sniff, decode, features
- ``layout``     — Z-order clustering for multi-column locality
"""

from phoebe_spark.operators import (  # noqa: F401
    candidates,
    curation,
    dedup,
    layout,
    multimodal,
    sampling,
    similarity,
    skew,
    skyline,
    text,
)
