"""Schemas and frozen vocabularies.

The reference fixes its input schema by declaration
(``/root/reference/model.py:212`` dtype map) and conforms every wide block
to frozen, closed column vocabularies (``/root/reference/run.py:105,243``
etc. — SURVEY §7.4.6).  We mirror both ideas: explicit ``StructType`` for
the canonical transactions table, and vocabularies as plain Python lists
used by pivot ``values=`` so pivots are single-shuffle with a deterministic
schema (no extra distinct-values pass — critical at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical transaction-log schema — /root/reference/model.py:208-213.
TX_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("mcc_code", T.IntegerType(), True),
        T.StructField("currency_rk", T.IntegerType(), True),
        T.StructField("transaction_amt", T.DoubleType(), True),
        T.StructField("transaction_dttm", T.TimestampType(), True),
        # Explicit file-order stamp: pandas row order is load-bearing in the
        # reference (anchor ts, cumsums, trims — SURVEY §7.4.1).  Spark has
        # no row order, so order is part of the data contract.
        T.StructField("ord", T.LongType(), True),
    ]
)

# Labels table — training.ipynb cell 5.
TARGET_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("target", T.IntegerType(), False),
    ]
)

# Prediction/submission table — /root/reference/model.py:244, run.py:484.
PREDICTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("target", T.DoubleType(), False),
    ]
)

# Frozen vocabularies for the driver's synthetic tables (stand-ins for the
# reference's 419-column one-hot / 156-code MCC vocabularies at
# /root/reference/run.py:105,243).  Closed lists => pivots never scan for
# distinct keys.
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
CURRENCIES = [48, 50, 60]
HOURS = list(range(24))
DAYS_OF_WEEK = list(range(7))  # pandas convention, Monday=0
DAYS_OF_MONTH = list(range(1, 32))
MONTHS = list(range(1, 13))

# TPC-H-ish closed vocabularies observed in the driver's testdata.
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
