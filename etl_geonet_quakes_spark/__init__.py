"""etl_geonet_quakes_spark — a PySpark-native analytics engine.

Re-expresses the full capability surface of the reference ETL
(``TAK-NZ/etl-geonet-quakes``, a scheduled GeoJSON fetch/filter/
transform/submit Lambda — see ``/root/reference/task.ts``) as an
idiomatic Spark DataFrame engine, and extends it with the relational
operator library and LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) required for running the
same pipelines at 100 TB scale.

Layout:

- ``session``    — SparkSession factory tuned for the target workload
- ``io``         — declared-schema scans over the fixture star schema
- ``quakes``     — reference-parity quake pipeline (source, transform, sink)
- ``operators``  — relational operator library (joins/aggs/windows/...)
- ``functions``  — scalar expression kits (time, strings, arrays)
- ``llm``        — dedup / similarity / text-analysis / multimodal ops
- ``streaming``  — Structured Streaming windows, dedup, upsert sink
- ``queries``    — the (spark_fn, oracle_sql) registry driving the
  driver contract in ``__spark_entry__.py``
"""

__version__ = "0.1.0"
