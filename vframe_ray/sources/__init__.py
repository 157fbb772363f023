"""Sources: parquet readers with pruning + predicate pushdown."""
