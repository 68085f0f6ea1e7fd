"""SQL-surface tests: the SQL-UDF library must stay bitwise-equivalent to
the DataFrame operators it mirrors, and must stay JVM-side (inlined
expressions, no Python-worker boundary)."""

from __future__ import annotations

import pyspark.sql.functions as F

from vtb_datafusion_2023_spark.functions.temporal import (
    pandas_dayofweek,
    seconds_since_midnight,
)
from vtb_datafusion_2023_spark.operators.text import fingerprint, with_token_count
from vtb_datafusion_2023_spark.sources.readers import load_table
from vtb_datafusion_2023_spark.sqlapi import register_sql_functions, register_tables


def test_sql_udfs_match_dataframe_operators(spark, sf_small):
    register_tables(spark, sf_small)
    register_sql_functions(spark)

    ev = load_table(spark, sf_small, "events")
    want = ev.select(
        "event_id",
        pandas_dayofweek(F.col("ts")).cast("int").alias("dow"),
        seconds_since_midnight(F.col("ts")).cast("bigint").alias("ssm"),
    )
    got = spark.sql(
        "select event_id, pandas_dow(ts) as dow, seconds_since_midnight(ts) as ssm from events"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    docs = load_table(spark, sf_small, "documents")
    want = with_token_count(docs, "text").select(
        "doc_id", "n_ws_tokens", "n_bpe_tokens", fingerprint(F.col("text")).alias("fp")
    )
    got = spark.sql(
        "select doc_id, ws_token_count(text) as n_ws_tokens, "
        "bpe_token_count(text) as n_bpe_tokens, doc_fingerprint(text) as fp "
        "from documents"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_sql_udfs_inline_no_python_boundary(spark, sf_small):
    register_tables(spark, sf_small)
    register_sql_functions(spark)
    q = spark.sql(
        "select doc_id, bpe_token_count(text) as n from documents where doc_id < 10"
    )
    p = q._jdf.queryExecution().executedPlan().toString()
    # inlined scalar expression: no Python eval operator, codegen stage only
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    f = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    # the raw-column predicate still pushes into the scan through the UDF projection
    assert "LessThan(doc_id,10)" in f, f


def test_udtf_chunking_matches_builtin_operator(spark, sf_small):
    """The chunk_text UDTF must be row-identical to the codegen
    chunk_documents path (two implementations, one contract)."""
    from vtb_datafusion_2023_spark.operators.text import chunk_documents
    from vtb_datafusion_2023_spark.sources.readers import load_table
    from vtb_datafusion_2023_spark.sqlapi import register_tables, register_udtfs

    register_tables(spark, sf_small)
    register_udtfs(spark)
    via_udtf = {
        (r.doc_id, r.chunk_id): (r.chunk, r.n_chunk_tokens)
        for r in spark.sql(
            "select d.doc_id, c.chunk_id, c.chunk, c.n_chunk_tokens "
            "from documents d, lateral chunk_text(d.text, 16) c"
        ).collect()
    }
    via_op = {
        (r.doc_id, r.chunk_id): (r.chunk, r.n_chunk_tokens)
        for r in chunk_documents(
            load_table(spark, sf_small, "documents"), chunk_tokens=16
        ).collect()
    }
    assert via_udtf == via_op and len(via_udtf) > 0
