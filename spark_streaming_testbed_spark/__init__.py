"""spark_streaming_testbed_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``skyluc/spark-streaming-testbed`` (reference, read-only at
``/root/reference``), re-expressed Spark-first:

- batch analytics as declarative DataFrame/SQL plans (Catalyst optimizes),
- the streaming testbed semantics as Structured Streaming
  (event-time tumbling windows, admission control, ``foreachBatch`` sinks),
- the deterministic rate-profile generator as pure Python + DataFrame
  materialization (``plans/``),
- the log-analytics pipeline as regex-extract DataFrame transforms
  (``sources/loglake.py``),
- plus LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns) designed for 100 TB scale.

Layout:
    plans/      rate-profile test plans (fixed/ramp/cycle/loop/noop)
    sources/    profile source materialization, log-lake parsers
    operators/  relational + dedup + similarity + text + multimodal ops
    functions/  scalar/agg function helpers (stats exprs, hanoi kernel)
    streaming/  structured-streaming pipelines + rate controller
"""

__version__ = "0.1.0"
