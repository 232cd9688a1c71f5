from .jdbc import (  # noqa: F401
    antijoin_upsert_ignore,
    insert_ignore_sql,
    jdbc_upsert_ignore,
    streaming_jdbc_sink,
)
from .parquet import upsert_ignore, upsert_replace, write_indicator_table  # noqa: F401
