"""Large-scale training-data pipeline operators, DataFrame-native.

Beyond the reference's query surface (SURVEY.md §2), these are the
operations a 100 TB corpus pipeline needs: deduplication (exact +
MinHash/SimHash/Jaccard near-dup), embedding similarity search, text
analysis, and multimodal column plumbing. Every operator is partition-
parallel — no driver-side collects in any data path."""

from apache_pinot_spark.operators import dedup, similarity, textanalysis, multimodal, skew  # noqa: F401
