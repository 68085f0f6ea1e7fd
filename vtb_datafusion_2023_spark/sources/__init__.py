from .artifacts import load_bin_edges  # noqa: F401
from .readers import load_table, load_tables, read_transactions_csv  # noqa: F401
from .writers import write_csv, write_parquet, checkpoint_parquet  # noqa: F401
