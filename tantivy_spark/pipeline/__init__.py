"""Large-scale training-data pipeline operators.

First-class operators a 100 TB web-corpus pipeline needs on top of the
search engine: deduplication (exact, MinHash-LSH, SimHash), similarity
search over embeddings, text statistics (token counts, quality scores,
language ID, fingerprints), and multimodal column plumbing.

Everything is declarative DataFrame ops or Arrow-vectorized kernels; the
design notes on each function state the scale path (what shuffles, what
broadcasts, where skew is handled).
"""

from tantivy_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup_groups,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash64,
)
from tantivy_spark.pipeline.similarity import brute_force_cosine_topk  # noqa: F401
from tantivy_spark.pipeline.textstats import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_scores,
    token_counts,
)
