"""navigator_document_parser_spark — a from-scratch PySpark-native
main-content extraction engine.

Re-expresses the semantics of climatepolicyradar/navigator-document-parser
(an imperative per-document CLI pipeline) as an idiomatic Spark DataFrame
pipeline: Iceberg/parquet documents table in, vectorized Arrow-batched
pandas UDFs for the per-document extraction map, idempotent MERGE-style
keyed sink with resume, plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
corpus pipeline needs.

Reference parity citations use file:line into /root/reference/.
"""

__version__ = "0.1.0"
