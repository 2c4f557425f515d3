"""PySpark-native analytics engine with the query and data-processing
capabilities of the GaspardMerten/MobilityDataLakeBenchmark reference.

The reference benchmarks ~21 hand-rolled storage strategies for a stream of
timestamped GeoJSON FeatureCollection snapshots (see SURVEY.md). This package
re-expresses every pipeline Spark-first:

- ``session``    — SparkSession factory tuned for the target workload.
- ``schemas``    — canonical StructTypes (GeoJSON doc, flat observation,
                   normalized star, temporal sequences, driver test tables).
- ``sources``    — readers/writers (JSON snapshot dir, partitioned parquet,
                   gzip JSON, size metrics).
- ``functions``  — column-expression library (codecs, temporal as-of, text
                   analysis, vector similarity, hashing).
- ``operators``  — storage-strategy pipelines as pure DataFrame->DataFrame
                   transforms with inverses (flat, velocity, temporal,
                   document) plus large-scale data-pipeline operators
                   (dedup, similarity search, multimodal).
- ``plans``      — explain/plan-assertion helpers (pushdown, broadcast).
- ``streaming``  — Structured Streaming ingest parity (micro-batch buffer
                   semantics of the reference's batched stores).

Everything here is public-knowledge PySpark; no proprietary systems.
"""

__version__ = "0.7.0"
