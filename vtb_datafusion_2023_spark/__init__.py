"""PySpark-native analytics engine with the query and data-processing
capabilities of kopylov-scl/VTB-DataFusion-2023 (reference at
/root/reference), rebuilt Spark-first.

The reference is a pandas/numpy/torch batch pipeline (run.py, model.py,
vrae/) scoring credit default from card-transaction logs.  This package
re-expresses every dataflow operator it implements (see SURVEY.md §2) as
idiomatic, scale-out PySpark: DataFrame/SQL transforms that Catalyst can
optimize, plus Arrow-batched ``mapInPandas`` surfaces for model inference.

Layout
------
- ``session``    : SparkSession helpers + runtime tuning applied defensively
- ``schema``     : schemas and frozen vocabularies (SURVEY §7.4.6)
- ``sources``    : readers/writers (CSV w/ schema, parquet, cache points)
- ``functions``  : scalar/temporal/statistical expression shims
- ``operators``  : the operator library (cleaning, pivots, stats, windows,
                   joins, dedup, similarity, text, multimodal)
- ``plans``      : composed pipelines (branch-C feature matrix, submission)
- ``streaming``  : Structured Streaming surface over the event operators
- ``inference``  : mapInPandas model-inference wrappers (broadcast artifacts)
"""

__version__ = "0.1.0"

from .session import get_spark, tune_session  # noqa: F401
