"""LLM-data-pipeline extension operators (SURVEY §2.10, BASELINE north star).

Beyond the reference's own surface: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search over embeddings, text
analysis (tokens, quality, language-ID, fingerprints), and multimodal
binary-column plumbing — each designed as a composed DataFrame plan
first, Arrow-batched pandas UDF only where built-ins can't express it.
"""

from etl_notifier_pipeline_spark.extensions import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
