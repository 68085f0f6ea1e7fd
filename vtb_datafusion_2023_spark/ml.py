"""U7/A16 via spark.ml: the training-side harness the reference runs
offline (training.ipynb cells 9, 16-17 — CatBoost + 10-fold stratified CV,
median AUC model selection).

CatBoost/torch are not installable here; ``spark.ml``'s gradient-capable
classifiers stand in behind the same (features, label) contract.  The
evaluator is ``BinaryClassificationEvaluator(metricName='areaUnderROC')``
(SURVEY §2.5 A16), and the CV harness mirrors the reference's fold count
and model-selection-by-AUC loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_vector(df: DataFrame, feature_cols: list[str], out_col: str = "features") -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=feature_cols, outputCol=out_col).transform(df)


def auc_evaluator(label_col: str = "label"):
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    return BinaryClassificationEvaluator(
        labelCol=label_col, metricName="areaUnderROC"
    )


def train_with_cv(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    n_folds: int = 10,
    reg_grid: list[float] = (0.0, 0.1),
    seed: int = 42,
):
    """10-fold CV over a logistic model (CatBoost stand-in; cells 16-17).

    Returns (best_model, avg_auc_per_grid_point).  At scale: CV folds are
    parallel Spark jobs; the feature matrix is never collected.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    data = assemble_vector(df, feature_cols).select(
        "features", F.col(label_col).cast("double").alias(label_col)
    )
    lr = LogisticRegression(featuresCol="features", labelCol=label_col, maxIter=50)
    grid = ParamGridBuilder().addGrid(lr.regParam, list(reg_grid)).build()
    cv = CrossValidator(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=auc_evaluator(label_col),
        numFolds=n_folds,
        seed=seed,
        parallelism=4,
    )
    model = cv.fit(data)
    return model.bestModel, list(model.avgMetrics)


def score_auc(df: DataFrame, feature_cols: list[str], label_col: str = "label") -> float:
    """Hold-out ROC-AUC of a quick fit (notebook cell 5 shape)."""
    from pyspark.ml.classification import LogisticRegression

    data = assemble_vector(df, feature_cols).select(
        "features", F.col(label_col).cast("double").alias(label_col)
    )
    train, test = data.randomSplit([0.7, 0.3], seed=7)
    m = LogisticRegression(featuresCol="features", labelCol=label_col, maxIter=50).fit(train)
    return float(auc_evaluator(label_col).evaluate(m.transform(test)))


def train_gbt_with_cv(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    n_folds: int = 10,
    max_iter: int = 20,
    max_depth: int = 3,
    step_size: float = 0.1,
    seed: int = 42,
):
    """Gradient-boosted trees + k-fold CV — the same model FAMILY as the
    reference's CatBoost (depth-3 boosted trees, cell 16: 750 iters,
    depth 3, lr 0.01), on spark.ml's distributed GBTClassifier.

    Pairs with ``inference.cbm`` for the serve side: train here, or train
    in catboost offline and score the exported ``.cbm`` through
    ``score_catboost`` — the engine covers both ends of U6/U7.

    Returns (best_model, avg_auc_per_grid_point) like ``train_with_cv``.
    """
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    data = assemble_vector(df, feature_cols).select(
        "features", F.col(label_col).cast("double").alias(label_col)
    )
    gbt = GBTClassifier(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        maxDepth=max_depth,
        stepSize=step_size,
        seed=seed,
    )
    grid = ParamGridBuilder().addGrid(gbt.maxDepth, [max_depth]).build()
    cv = CrossValidator(
        estimator=gbt,
        estimatorParamMaps=grid,
        evaluator=auc_evaluator(label_col),
        numFolds=n_folds,
        seed=seed,
        parallelism=4,
    )
    model = cv.fit(data)
    return model.bestModel, list(model.avgMetrics)


def calibrate_isotonic(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
):
    """Monotone score calibration (isotonic regression): map raw model
    scores (e.g. the GBDT logits from ``inference.score_catboost``) to
    empirical probabilities without changing their ranking — so ROC-AUC
    is preserved while probabilities become decision-grade.

    Distributed PAV via spark.ml IsotonicRegression; returns the fitted
    model (``.transform`` adds ``calibrated``).
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    data = VectorAssembler(inputCols=[score_col], outputCol="_f").transform(
        df.select(F.col(score_col).cast("double"), F.col(label_col).cast("double"))
    )
    iso = IsotonicRegression(
        featuresCol="_f", labelCol=label_col, predictionCol="calibrated"
    )
    return iso.fit(data)
