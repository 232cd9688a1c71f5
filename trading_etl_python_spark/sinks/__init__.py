from .parquet import upsert_ignore, upsert_replace, write_indicator_table  # noqa: F401
