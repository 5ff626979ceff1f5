"""seafowl_spark — a PySpark-native analytics engine with the capabilities of
splitgraph/seafowl (reference: /root/reference, seafowl v0.5.8).

Architecture (SURVEY.md §7): Spark SQL + Catalyst is the relational engine,
exactly as DataFusion is seafowl's engine (reference src/context/logical.rs:104-117).
Our own code is the serving layer, versioned Parquet storage ("deltalite",
replacing the reference's delta-rs dependency), metastore, statement routing,
time travel, UDF plumbing, CDC merge, and the training-data operators
(dedup / similarity / text analysis) that a 100 TB pipeline needs.

Subpackages:
  session    — tuned SparkSession builder (AQE, shuffle partitions, UTC)
  io         — testdata table loaders / temp-view registration
  queries    — the operator registry exposed via __spark_entry__.py
  functions  — portable column helpers (decimal-exact sums, md5 hashing,
               minhash/simhash primitives, cosine similarity)
  engine     — metastore + deltalite versioned storage + statement router
  sources    — external table readers (csv/json/parquet/http shim)
  streaming  — CDC sync ingest (Structured Streaming / micro-batch merge)
"""

__version__ = "0.1.0"
