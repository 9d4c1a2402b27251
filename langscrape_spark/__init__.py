"""langscrape_spark — a PySpark-native batch crawl/extract engine.

A from-scratch reimplementation of the *capabilities* of
DelmedigoA/langscrape (reference at /root/reference, surveyed in
SURVEY.md) as an idiomatic Spark batch dataflow:

- ``html/``       pure-Python deterministic extraction kernel (no Spark)
- ``functions/``  Arrow-vectorized pandas UDFs + column expressions
- ``operators/``  DataFrame-level operators (dedup, ranking, eval, ANN)
- ``scheduler/``  URL-frontier round loop (seen-set, politeness, robots)
- ``sources/``    pages-table + checkpoint catalog (parquet here;
                  Iceberg in production deployments)
- ``plans/``      end-to-end query pipelines
- ``streaming/``  batch-round incremental runner (north rule prescribes
                  spark-submit rounds, not Structured Streaming)
"""

__version__ = "0.1.0"
