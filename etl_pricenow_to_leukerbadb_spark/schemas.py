"""Explicit StructType schemas (SURVEY §1.3-1.4).

Input schemas are permissive (the reference probes payload shapes
defensively); output/sink schemas are fixed contracts.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Nested products payload: one element per product, each with a
#: ``productDefinitions`` array carrying typed attribute structs
#: (reference ``pricenow_etl.py:296-313``; FIXTURES.md F1).
PRODUCT_PAYLOAD = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField(
            "productDefinitions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField(
                            "attributes",
                            T.StructType(
                                [
                                    T.StructField(
                                        "age",
                                        T.StructType([T.StructField("value", T.StringType())]),
                                    ),
                                    T.StructField(
                                        "duration",
                                        T.StructType([T.StructField("value", T.StringType())]),
                                    ),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

#: Envelope variants the source accepts: a bare list or a dict wrapping
#: the list under data/items/results (reference ``pricenow_etl.py:153-161``).
PRODUCT_ENVELOPE = T.StructType(
    [
        T.StructField("data", T.ArrayType(PRODUCT_PAYLOAD)),
        T.StructField("items", T.ArrayType(PRODUCT_PAYLOAD)),
        T.StructField("results", T.ArrayType(PRODUCT_PAYLOAD)),
    ]
)

#: Sparse price change-point rows (reference ``pricenow_etl.py:178``;
#: FIXTURES.md F2). ``price`` is integer minor units — never float money.
PRICE_CHANGES = T.StructType(
    [
        T.StructField("productDefinitionId", T.LongType()),
        T.StructField("validAt", T.StringType()),  # wire format 'YYYY-MM-DD'
        T.StructField("price", T.LongType()),
    ]
)

#: Sink contract: product dimension (reference ``pricenow_etl.py:256,289``).
PRODUCTS_SINK = T.StructType(
    [
        T.StructField("product_id", T.LongType(), False),
        T.StructField("category", T.StringType()),
        T.StructField("age", T.StringType()),
        T.StructField("duration", T.StringType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

#: Sink contract: dense daily prices (reference ``pricenow_etl.py:279,371-374``).
PRICES_SINK = T.StructType(
    [
        T.StructField("product_id", T.LongType(), False),
        T.StructField("valid_from", T.DateType(), False),
        T.StructField("price", T.LongType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

#: Raw testdata ``events`` table after loader normalization
#: (``ts`` arrives as int64 nanoseconds in parquet; loader converts).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

#: LEGACY raw parquet schema (testdata generations that stored ``ts``
#: as TIMESTAMP(NANOS), read as int64 via the nanosAsLong conf). Current
#: generations store TIMESTAMP(MICROS); both loaders now sniff the file
#: footer instead of assuming this layout, so nothing imports this —
#: kept as documentation of the encoding the nanos branch handles.
EVENTS_RAW_PARQUET = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # int64 nanos on disk
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
