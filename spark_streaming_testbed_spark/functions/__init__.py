from .stats import stats_aggs  # noqa: F401
