"""Canonical StructTypes for the FX domain.

The reference declares its schema as hardcoded MySQL DDL
(``/root/reference/Fx_1min.py:29-40``); here the same schema is a first-class
``StructType`` so every ingest path is schema-checked instead of
schema-on-write.
"""

from __future__ import annotations

from pyspark.sql import types as T

# exchange_rates — DDL at /root/reference/Fx_1min.py:29-40.
# event_id (surrogate, never queried) is intentionally omitted; Spark-side a
# synthetic id adds a shuffle-free monotonically_increasing_id when needed.
EXCHANGE_RATES = T.StructType(
    [
        T.StructField("event_time", T.LongType(), False),  # epoch ms (Fx_1min.py:32,73)
        T.StructField("ccy_couple", T.StringType(), False),  # "EUR/USD" (Fx_1min.py:33,71)
        T.StructField("rate", T.DecimalType(10, 6), False),  # (Fx_1min.py:34)
        T.StructField("date", T.TimestampType(), False),  # quote date 00:00 (Fx_1min.py:35)
        T.StructField("timestamp", T.TimestampType(), True),  # ingestion time (Fx_1min.py:36)
    ]
)

# currency_pairs.csv — /root/reference/currency_pairs.csv:1
CURRENCY_PAIRS = T.StructType(
    [
        T.StructField("base_currency", T.StringType(), False),
        T.StructField("target_currency", T.StringType(), False),
    ]
)

# Alpha Vantage FX_DAILY response shape navigated at /root/reference/Fx_1min.py:69-76:
# {"Meta Data": {...}, "Time Series FX (Daily)": {"YYYY-MM-DD": {"4. close": "...", ...}}}
# All leaves are strings; the reference casts float() at Fx_1min.py:72.
RAW_RATES_JSON = T.StructType(
    [
        T.StructField("Meta Data", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "Time Series FX (Daily)",
            T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType())),
            True,
        ),
    ]
)

# Result schema of the analytics report (Fx_1min.py:200-216, golden rows PDF p.6)
RATE_CHANGE_REPORT = T.StructType(
    [
        T.StructField("ccy_couple", T.StringType(), False),
        T.StructField("current_rate", T.DecimalType(10, 6), True),
        T.StructField("previous_rate", T.DecimalType(10, 6), True),
        T.StructField("percentage_change", T.StringType(), True),
    ]
)
