from .parquet import upsert_ignore, write_indicator_table  # noqa: F401
