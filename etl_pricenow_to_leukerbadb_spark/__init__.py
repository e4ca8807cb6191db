"""PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``anka-gueldenpfennig/etl-pricenow-to-leukerbadb``
(single-file pandas ETL, see SURVEY.md), generalized into a reusable
engine:

- ``sources/``    — table loaders, paginated REST source, JSON envelope
                    normalization (SURVEY S1-S7).
- ``functions/``  — scalar/text/vector column expression builders
                    (SURVEY T3/T8/T9, §2.7, plus text & vector analysis).
- ``operators/``  — DataFrame->DataFrame transforms: calendar grids,
                    forward-fill densification, as-of joins, dedup
                    (exact/MinHash-LSH/SimHash/Jaccard/embedding),
                    similarity search, multimodal column plumbing.
- ``sinks/``      — keyed upsert (merge) sinks (SURVEY K1-K3).
- ``plans/``      — pipeline assemblies (the Pricenow-domain E1/E2/E3
                    pipeline) and the oracle-paired query registry.
- ``streaming/``  — Structured Streaming jobs (windowed aggs, streaming
                    upsert via foreachBatch).

Everything is DataFrame/SQL-first: logical plans are declared with the
PySpark DataFrame API and Catalyst/Tungsten pick the physical strategy.
Python UDFs appear only where built-ins cannot express the semantics
(multimodal decode stubs), always as Arrow-batched ``mapInPandas``.
"""

__version__ = "0.1.0"
