from .udfs import linear_scorer, score_with_model, BroadcastModel  # noqa: F401
