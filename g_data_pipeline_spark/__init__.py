"""g_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``Geneline-X/g-data-pipeline`` (a Rust/Actix/Polars CSV-analytics service,
surveyed in SURVEY.md) on Apache Spark, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) the reference lacks.

Layers
------
- ``session``   : SparkSession construction tuned for the target scale.
- ``catalog``   : table loading / temp-view registration for the test data.
- ``ir``        : the reference's StructuredQuery JSON IR (intents + ops).
- ``plans``     : IR -> single lazy DataFrame chain compiler (Catalyst sees
                  the whole plan; no per-op collect()).
- ``profiler``  : one-pass per-column statistical profile (the reference's
                  flagship computation, SURVEY.md §2.3).
- ``sources``   : CSV -> Parquet ingest with date coercion + metadata.
- ``functions`` : text / vector scalar function library (JVM-side exprs).
- ``operators`` : dedup, similarity search, windowed aggregation, top-k.
- ``streaming`` : Structured Streaming pipelines over event streams.
- ``multimodal``: binary-column (image/audio/video) plumbing with stubbed
                  codecs (decode libs not present in this environment).

Everything here is public-knowledge PySpark; no code is copied from the
reference (which is a single-node Polars engine — see SURVEY.md §4).
"""

__version__ = "0.1.0"
