"""storm_data_etl_service_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference Go service ``couchcryptid/storm-data-etl-service``
(studied read-only at /root/reference) on idiomatic Apache Spark:

* the stateless per-record enrichment chain (type normalization,
  magnitude parsing, severity classification, regex extraction, time
  bucketing, deterministic SHA-256 IDs) as pure Catalyst column
  expressions — no UDFs, fully whole-stage-codegen'd
  (reference: internal/domain/transform.go);
* the analytical query surface its fixture generator and validator
  exercise (grouped/filtered counts, top-N, geo box, anti-join,
  equi-join compare, dedup, domain validation) as DataFrame builders
  (reference: cmd/genmock/main.go, cmd/validate/main.go);
* the Kafka→Kafka micro-batch loop as Structured Streaming
  (reference: internal/pipeline/pipeline.go);
* beyond-reference large-scale training-data operators: exact and
  near deduplication (MinHash/LSH, SimHash, n-gram Jaccard),
  embedding similarity search, text analysis, multimodal column
  plumbing — all designed partition-parallel for 100 TB posture.
"""

__version__ = "0.1.0"
