"""Projection operators P4-P9 (SURVEY §2.2).

All narrow (no shuffle), whole-stage-codegen-friendly column expressions —
the 100 TB cost of this whole module is one map stage fused into the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def debit_credit(df: DataFrame, amt_col: str = "transaction_amt") -> DataFrame:
    """P4: split a signed amount into debit (>0) / credit (<0) columns,
    NULL where the condition fails (/root/reference/run.py:98-99).
    NULLs then vanish inside aggregates — same as pandas NaN."""
    amt = F.col(amt_col)
    return df.withColumn("debit", F.when(amt > 0, amt)).withColumn(
        "credit", F.when(amt < 0, amt)
    )


def one_hot(df: DataFrame, col: str, vocab: Sequence, prefix: str | None = None) -> DataFrame:
    """P5: one-hot over a FROZEN vocabulary (/root/reference/run.py:103-108).

    The closed vocab means this is a single projection — no distinct-values
    scan, no shuffle, deterministic schema at any scale.  Categories absent
    from the data still appear (all-zero), mirroring the reference's
    ``reindex(columns=...) + fillna(0)`` (P9).
    """
    prefix = prefix or col
    cols = [
        F.when(F.col(col) == F.lit(v), 1).otherwise(0).alias(f"{prefix}_{v}")
        for v in vocab
    ]
    return df.select("*", *cols)


def bin_by_edges(col: Column | str, edges: Sequence[float]) -> Column:
    """P7: ``pd.cut(x, bins=edges, labels=False)`` parity
    (/root/reference/model.py:172-181).

    Half-open (lo, hi] intervals like pd.cut default (right=True); values
    outside all edges -> NULL (pandas NaN).

    Short edge lists compile to a when-chain (constant-folds well); long
    lists (the reference's 395-edge mcc bins) would blow the analyzer's
    expression-tree depth, so they compile instead to a rank scan over an
    array literal: ``bin = size(filter(edges, e -> x > e)) - 1`` with an
    in-range guard — one shallow expression whatever the edge count.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = len(edges)
    if n <= 64:
        expr = F.lit(None).cast("int")
        for i in range(n - 1, 0, -1):
            expr = F.when((c > edges[i - 1]) & (c <= edges[i]), i - 1).otherwise(expr)
        return expr
    arr = F.array(*[F.lit(float(e)) for e in edges])
    rank = F.size(F.filter(arr, lambda e: c.cast("double") > e))
    return F.when((rank >= 1) & (rank <= n - 1), rank - 1).cast("int")


def conform_columns(df: DataFrame, columns: Sequence[str], fill: float = 0.0) -> DataFrame:
    """P9/J5: reindex to a closed column list; missing columns become
    ``fill`` (/root/reference/run.py:106-108,470-475)."""
    present = set(df.columns)
    return df.select(
        *[F.col(c) if c in present else F.lit(fill).alias(c) for c in columns]
    )


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long unpivot (pandas ``melt``; the inverse of the A1-A6
    pivots).  Planned as a single ``stack`` projection — one scan, no
    shuffle, no join: at 100 TB this is a map-only reshape whose output
    is len(value_cols) x input rows.
    """
    cells = ", ".join(f"'{c}', cast({c} as double)" for c in value_cols)
    expr = f"stack({len(value_cols)}, {cells}) as ({var_name}, {value_name})"
    return df.selectExpr(*id_cols, expr)


def json_col(df: DataFrame, col: str, schema_ddl: str, prefix: str = "") -> DataFrame:
    """Schema-bound extraction of a JSON string column (semi-structured
    sidecar like ``events.props``): ``from_json`` with a DECLARED schema —
    one parse per row, all fields out at once, malformed rows -> null
    fields (never a job failure).

    Prefer this over repeated ``get_json_object`` (one parse per field)
    and over schema inference (a full extra pass at 100 TB).
    """
    parsed = F.from_json(F.col(col), schema_ddl)
    names = [f.split()[0] for f in schema_ddl.split(",")]
    return df.select(
        "*", *[parsed.getField(n).alias(f"{prefix}{n}") for n in names]
    )


def hashed_features(
    df: DataFrame,
    cols: list[str],
    n_buckets: int = 256,
    crosses: list[list[str]] | None = None,
    prefix: str = "hf",
) -> DataFrame:
    """Hashing-trick categorical encoding (Weinberger et al. 2009): each
    value maps to a stable bucket in ``[0, n_buckets)`` — the unbounded-
    vocabulary alternative to the reference's frozen one-hot list
    (/root/reference/run.py:103-108): no vocabulary pass, no conform
    step, new categories at inference time land in a bucket instead of
    being dropped.

    ``crosses`` adds feature-cross columns (bucket of the '\\x1f'-joined
    value tuple) — interaction features without materializing the cross
    product.  Buckets come from ``sqlgen.md5_bucket`` (column-name
    salted), so they are partition-independent, engine-independent
    (DuckDB-replayable), and stable across runs — a training set encoded
    today and a scoring row encoded next year agree.  Pure codegen
    projection: no shuffle, no vocabulary state.
    """
    from .. import sqlgen

    out = df
    for c in cols:
        out = out.withColumn(
            f"{prefix}_{c}", F.expr(sqlgen.md5_bucket(c, n_buckets, salt=f"{c}:"))
        )
    for cross in crosses or []:
        name = f"{prefix}_{'_x_'.join(cross)}"
        joined = " || chr(31) || ".join(f"(({c}) || '')" for c in cross)
        out = out.withColumn(
            name,
            F.expr(sqlgen.md5_bucket(f"({joined})", n_buckets, salt=f"{'x'.join(cross)}:")),
        )
    return out
