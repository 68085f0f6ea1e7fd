from .artifacts import load_bin_edges  # noqa: F401
from .bucketed import bucketed_checkpoint, read_bucketed, write_bucketed  # noqa: F401
from .readers import load_table, load_tables, read_jsonl, read_transactions_csv  # noqa: F401
from .writers import checkpoint_parquet, write_csv, write_jsonl, write_parquet  # noqa: F401
