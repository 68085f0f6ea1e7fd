"""Driver-facing correctness suite.

Every operator in SURVEY.md §2 (plus the training-data-pipeline extensions)
is exposed here as a named query over the driver's synthetic tables, paired
with the ANSI-SQL oracle DuckDB runs on the same parquet files.  The
``__spark_entry__`` module re-exports this registry; ``tools/oracle_check``
and ``tests/test_oracle.py`` replicate the driver's t2 gate locally.

Contract (see repo root ``__spark_entry__.py``): Spark result and oracle
result must match on row count, schema, and order-insensitive value hash —
so every computed column is aliased identically on both sides, and float
aggregates use deterministic arithmetic (see ``functions.stats``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    survey_ref: str  # SURVEY.md §2 operator ids this query certifies
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, survey_ref: str, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the suite."""

    def wrap(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref, doc=doc)
        return fn

    return wrap


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every suite module (each registers its queries on import).

    ORDER MATTERS for the driver's correctness gate: it runs queries in
    registration order under a wall-clock budget (round 1 covered only the
    first 50 of 135).  Modules whose queries lacked a green row in
    CORRECTNESS_r01 import first (joins J1-J5/A14, windows W2-W14,
    pipeline, the dedup/ANN/text/multimodal extensions, streaming, TPC-H);
    the modules fully certified in round 1 (basics, aggregates, cleaning)
    re-certify last.
    """
    global _LOADED
    if _LOADED:
        return
    from . import joins  # noqa: F401
    from . import windows  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import inference  # noqa: F401
    from . import datapipe  # noqa: F401
    from . import streaming  # noqa: F401
    from . import tpch  # noqa: F401
    from . import tpch2  # noqa: F401
    from . import basics  # noqa: F401
    from . import aggregates  # noqa: F401
    from . import cleaning  # noqa: F401

    _LOADED = True
