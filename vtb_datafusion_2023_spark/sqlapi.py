"""SQL surface: the engine's operator library exposed to ``spark.sql``.

Two registration calls give a SQL-only user the same capabilities the
DataFrame API exposes (SURVEY §7.1 step 8):

- ``register_tables(spark, sf_dir)`` — every driver table as a temp view
  (through ``load_table``, so the nanos-timestamp parquet reads correctly).
- ``register_sql_functions(spark)`` — the engine's scalar function library
  as Spark 4 **SQL UDFs** (``CREATE FUNCTION ... RETURN <expr>``).  SQL
  UDFs are inlined into the plan at analysis time: they stay JVM-side
  inside whole-stage codegen, cost nothing at 100 TB, and — unlike Python
  UDFs — don't block predicate pushdown through them.

Each function body mirrors the corresponding Column expression in
``functions.temporal`` / ``operators.text`` exactly; equivalence is
locked by ``tests/test_sqlapi.py`` (bitwise comparison per function) so
the two surfaces cannot drift.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .schema import TESTDATA_TABLES
from .sources.readers import register_views

# name -> (signature, body).  Bodies are pure built-in expressions.
SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    # temporal (functions/temporal.py; pandas conventions, SURVEY P1/P2)
    "pandas_dow": ("(ts TIMESTAMP) RETURNS INT", "(dayofweek(ts) + 5) % 7"),
    "seconds_since_midnight": (
        "(ts TIMESTAMP) RETURNS BIGINT",
        "cast(hour(ts) as bigint) * 3600 + minute(ts) * 60 + second(ts)",
    ),
    "hours_since": (
        "(ts TIMESTAMP, anchor_epoch BIGINT) RETURNS BIGINT",
        "cast(floor((unix_timestamp(ts) - anchor_epoch) / 3600) as bigint)",
    ),
    # text (operators/text.py)
    "ws_token_count": ("(t STRING) RETURNS INT", "size(split(t, ' '))"),
    "bpe_token_count": (
        "(t STRING) RETURNS INT",
        r"size(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0))",
    ),
    "norm_text": (
        "(t STRING) RETURNS STRING",
        "trim(regexp_replace(regexp_replace(lower(t), '[^a-z0-9 ]', ' '), ' +', ' '))",
    ),
    "doc_fingerprint": (
        "(t STRING) RETURNS STRING",
        "md5(array_join(array_sort(array_distinct(split(t, ' '))), ' '))",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the scalar library as session-scoped SQL UDFs; returns the
    registered names."""
    for name, (sig, body) in SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")
    return list(SQL_FUNCTIONS)


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose every driver table as a temp view named after the table."""
    register_views(spark, sf_dir)
    return list(TESTDATA_TABLES)


def register_udtfs(spark: SparkSession) -> list[str]:
    """Install the engine's Python table functions (Spark UDTF surface).

    ``chunk_text(text, size)`` emits one row per ``size``-token window of
    the input (chunk_id, chunk, n_chunk_tokens) — callable from SQL as a
    LATERAL table function.  Its output is defined to match
    ``operators.text.chunk_documents`` bitwise (locked by the
    ``sql_udtf_chunking`` oracle, which reuses the chunking SQL oracle).

    Perf note: a UDTF is a Python-worker boundary evaluated per row —
    it is the EXTENSIBILITY surface, not the hot path; pipelines should
    prefer the codegen ``chunk_documents`` and reach for a UDTF only for
    logic Spark expressions cannot state.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id bigint, chunk string, n_chunk_tokens bigint")
    class ChunkText:
        def eval(self, text: str, size: int):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(0, max(len(toks), 1), size):
                window = toks[i : i + size]
                yield (i // size, " ".join(window), len(window))

    spark.udtf.register("chunk_text", ChunkText)
    return ["chunk_text"]
