"""JSON payload envelope normalization (SURVEY S5/T1/T2).

The reference's source accepts a bare list of products or a dict
wrapping it under ``data``/``items``/``results``
(``pricenow_etl.py:153-161``); products then explode one row per
``productDefinitions`` element with nested attribute structs
(``:296-313``). Spark-first: permissive ``from_json`` over the
envelope variants + ``coalesce`` + ``explode`` — all Catalyst-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import PRODUCT_ENVELOPE, PRODUCT_PAYLOAD
from ..session import tiny_local_df


def products_from_payloads(spark: SparkSession, payloads: list[str]) -> DataFrame:
    """Parse raw JSON payload strings (one HTTP response body each)
    into one row per product, tolerating every envelope variant."""
    raw = tiny_local_df(
        spark,
        [(p,) for p in payloads],
        T.StructType([T.StructField("body", T.StringType())]),
    )
    bare = F.from_json(F.col("body"), T.ArrayType(PRODUCT_PAYLOAD))
    wrapped = F.from_json(F.col("body"), PRODUCT_ENVELOPE)
    # from_json(ArrayType) turns a dict payload into [null] rather than
    # null, so dispatch on the body's first character instead of
    # coalescing bare-vs-wrapped directly. First NON-WHITESPACE char:
    # Spark's ltrim strips only ASCII space, so a pretty-printed body
    # starting with a newline/tab before '[' would be misrouted to the
    # envelope parser and silently yield zero rows.
    is_bare = F.regexp_extract(F.col("body"), r"^\s*(\S)", 1) == "["
    products = F.when(is_bare, bare).otherwise(
        F.coalesce(wrapped["data"], wrapped["items"], wrapped["results"], F.array())
    )
    return raw.select(F.explode(products).alias("product")).select("product.*")


def explode_product_definitions(products: DataFrame) -> DataFrame:
    """One output row per product definition with flattened attributes
    (T1 explode + T2 struct projection, reference py:299-313)."""
    return products.select(
        F.col("name").alias("category"),
        F.explode("productDefinitions").alias("pd"),
    ).select(
        F.col("pd.id").alias("product_id"),
        "category",
        F.col("pd.attributes.age.value").alias("age"),
        F.col("pd.attributes.duration.value").alias("duration"),
    )
