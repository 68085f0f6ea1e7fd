"""Shared helpers for suite queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import tune_session
from ..sources.readers import load_table

# The driver's events table stands in for the reference's transaction log
# (FIXTURES.md §1): user_id ~ user, event_type ~ mcc_code, value ~ amount,
# ts ~ transaction_dttm, event_id ~ the explicit file-order stamp.  The
# reference's amounts are SIGNED (debit/credit — run.py:98-99); events.value
# is positive, so suite queries derive a deterministic signed amount:
SIGNED_AMT = "(case when event_type in ('purchase', 'error') then -value else value end)"

# F2 blacklist stand-in for MCC 6012 (run.py:201)
BLACKLIST_TYPE = "error"


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)
