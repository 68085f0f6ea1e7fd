from .projections import one_hot, bin_by_edges, conform_columns, debit_credit  # noqa: F401
from .filtering import blacklist, frequency_filter, positional_trim  # noqa: F401
from .pivots import pivot_agg, row_normalize  # noqa: F401
from .gstats import vertical_stats, horizontal_stats, group_percentiles  # noqa: F401
from .cleaning import clean_transactions, winsorize_to_median, rare_category_rewrite  # noqa: F401
from .windows import with_cumsum, reanchor_first, zscore, keep_last_n, assemble_sequences  # noqa: F401
from .joins import assemble_features, anti_join_missing, union_fill_max, ensemble_mean  # noqa: F401
