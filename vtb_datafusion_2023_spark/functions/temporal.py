"""Temporal projections P1-P3 (SURVEY §2.2).

Parity notes vs the reference (/root/reference/run.py:91-97,186-192,
model.py:216-220):

- pandas ``dt.dayofweek`` is Monday=0..Sunday=6; Spark ``dayofweek`` is
  Sunday=1..Saturday=7.  Shim: ``(dayofweek(ts) + 5) % 7``.
- "hours since anchor" is a floor-cast of a timedelta to whole hours
  (``run.py:96`` ``.astype('timedelta64[h]')``); anchor is the timestamp
  of the FIRST ROW OF THE FILE — positional semantics we replace with
  "timestamp at the minimum ``ord``" (SURVEY §7.4.1).  Note: numpy's
  timedelta cast truncates toward zero; with anchor = first/min timestamp
  all deltas are >= 0 so floor == truncate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pandas_dayofweek(ts: Column) -> Column:
    """Day of week, Monday=0 (pandas convention)."""
    return (F.dayofweek(ts) + F.lit(5)) % 7


def seconds_since_midnight(ts: Column) -> Column:
    """P2: seconds since midnight (run.py:97,192).  Long-typed so derived
    min/max/amplitude stats keep int64 parity with the oracle."""
    return (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)).cast("long")


def hours_since(ts: Column, anchor_epoch_seconds: Column | int) -> Column:
    """P3: whole hours elapsed from a global anchor timestamp.

    ``floor((unix(ts) - anchor)/3600)`` as LONG.  The anchor is resolved
    driver-side (one tiny ``min_by`` aggregate) and passed as a literal so
    the projection stays a narrow map — no join, no shuffle at 100 TB.
    """
    anchor = F.lit(anchor_epoch_seconds) if isinstance(anchor_epoch_seconds, int) else anchor_epoch_seconds
    return F.floor((F.unix_timestamp(ts) - anchor) / 3600).cast("long")


def with_time_parts(df: DataFrame, ts_col: str = "transaction_dttm") -> DataFrame:
    """P1+P2: append hour / day_of_week (pandas) / day / month / time_day."""
    ts = F.col(ts_col)
    return (
        df.withColumn("hour", F.hour(ts))
        .withColumn("day_of_week", pandas_dayofweek(ts))
        .withColumn("day_of_month", F.dayofmonth(ts))
        .withColumn("month", F.month(ts))
        .withColumn("time_day", seconds_since_midnight(ts))
    )
