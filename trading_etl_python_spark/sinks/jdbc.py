"""JDBC sink adapter: the reference's Postgres write path re-expressed
for Spark's execution model.

Reference semantics being reproduced (citations into /root/reference/):

- ``INSERT INTO stock_indicators ... ON CONFLICT (time, symbol) DO
  NOTHING`` via psycopg2 ``execute_values`` — a single-process,
  row-batch loop (trading-etl-python/src/processing/consumer.py:195-204,
  src/db/backfill.py:158-166).

Spark-first shape (``jdbc_upsert_ignore``):

1. **Stage executor-parallel.**  ``batch_df.write.jdbc`` appends into a
   per-epoch staging table: every executor opens its own connection and
   streams its partitions (``numPartitions`` bounds the connection
   count).  No rows ever pass through the driver — the reference's
   ``execute_values`` loop is exactly the shape that caps at one
   process's throughput.
2. **Resolve conflicts server-side, set-based.**  ONE
   ``INSERT ... SELECT ... ON CONFLICT (keys) DO NOTHING`` from staging
   into the target.  The database resolves key collisions under its own
   PK index — at-least-once delivery (a replayed epoch re-stages the
   same rows) therefore lands effectively-once, the same guarantee the
   parquet ``upsert_ignore`` sink gives via anti-join.
3. **Drop staging.**  Staging tables are keyed by (target, epoch), so a
   retry of the same epoch overwrites its own staging table and the
   conflict insert stays idempotent.

Dialects: ``postgresql`` (ON CONFLICT, the reference's target) and
``ansi``/``mysql`` variants of the same set-based statement.  For
engines with none of these, ``antijoin_upsert_ignore`` reads ONLY the
target's key columns (column pruning pushes into the JDBC scan) and
anti-joins before a plain append — weaker (not atomic vs concurrent
writers) but dialect-free.

No JDBC driver jar ships in this container, so the statement executor
is injectable (``run_sql``) and defaults to a java.sql.DriverManager
call through the JVM gateway; tests inject a recorder and verify the
exact statements.  The structure — stage, one set-based statement,
drop — is the part that matters at scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def quote_ident(name: str, dialect: str = "postgresql") -> str:
    """Quote an SQL identifier per dialect, rejecting embedded quote
    chars rather than escaping them — table/column names here come from
    code, not data, so an embedded quote is a bug upstream.

    MySQL uses backticks (default sql_mode has no ANSI_QUOTES, so
    double-quoted identifiers are a syntax error there — ADVICE r3);
    every other dialect gets ANSI double quotes.  A schema-qualified
    name ('public.stock_indicators') is split and each part quoted
    separately, so it stays a qualified reference instead of one
    identifier with a dot in it (ADVICE r3)."""
    qc = "`" if dialect == "mysql" else '"'
    parts = name.split(".")
    if len(parts) > 2:
        raise ValueError(f"identifier nests deeper than schema.table: {name!r}")
    for p in parts:
        if not p or qc in p:
            raise ValueError(f"bad identifier part {p!r} in {name!r} ({dialect})")
    return ".".join(f"{qc}{p}{qc}" for p in parts)


def stage_table_name(table: str, epoch_id: int) -> str:
    return f"{table}__stage_{int(epoch_id)}"


def insert_ignore_sql(
    table: str, stage: str, cols: list[str], keys: tuple[str, ...], dialect: str = "postgresql"
) -> str:
    """The one set-based conflict-ignoring insert, per dialect.  Mirrors
    consumer.py:197-201's statement with the VALUES list replaced by a
    SELECT from the staged table."""
    collist = ", ".join(quote_ident(c, dialect) for c in cols)
    keylist = ", ".join(quote_ident(k, dialect) for k in keys)
    t, s = quote_ident(table, dialect), quote_ident(stage, dialect)
    if dialect == "postgresql":
        return (
            f"INSERT INTO {t} ({collist}) SELECT {collist} FROM {s} "
            f"ON CONFLICT ({keylist}) DO NOTHING"
        )
    if dialect == "mysql":
        return f"INSERT IGNORE INTO {t} ({collist}) SELECT {collist} FROM {s}"
    if dialect == "ansi":  # MERGE, supported by most serious engines
        on = " AND ".join(f"t.{quote_ident(k, dialect)} = s.{quote_ident(k, dialect)}" for k in keys)
        ins = ", ".join(f"s.{quote_ident(c, dialect)}" for c in cols)
        return (
            f"MERGE INTO {t} t USING {s} s ON {on} "
            f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({ins})"
        )
    raise ValueError(f"unknown dialect {dialect!r}")


def _default_run_sql(spark, url: str, properties: dict | None) -> Callable[[str], None]:
    """Driver-side statement executor over java.sql (needs the driver jar
    on the Spark classpath; absent in this container — injectable)."""
    props = properties or {}

    def run(sql: str) -> None:
        jvm = spark._jvm
        jprops = jvm.java.util.Properties()
        for k, v in props.items():
            jprops.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
        try:
            stmt = conn.createStatement()
            try:
                stmt.executeUpdate(sql)
            finally:
                stmt.close()
        finally:
            conn.close()

    return run


def jdbc_upsert_ignore(
    batch_df: DataFrame,
    url: str,
    table: str,
    keys: tuple[str, ...] = ("time", "symbol"),
    epoch_id: int = 0,
    dialect: str = "postgresql",
    properties: dict | None = None,
    num_partitions: int | None = None,
    run_sql: Callable[[str], None] | None = None,
    write_stage: Callable[[DataFrame, str], None] | None = None,
) -> list[str]:
    """Idempotent conflict-ignoring JDBC write of one (micro-)batch; see
    module docstring for the three-step shape.  Returns the statements it
    executed (useful for audit logs and tests).

    Use directly for batch jobs, or as the ``foreachBatch`` body via
    ``streaming_jdbc_sink``.  ``write_stage``/``run_sql`` are injection
    points for environments without a driver jar."""
    spark = batch_df.sparkSession
    run = run_sql or _default_run_sql(spark, url, properties)
    stage = stage_table_name(table, epoch_id)
    cols = list(batch_df.columns)
    for k in keys:
        if k not in cols:
            raise ValueError(f"key column {k!r} missing from batch columns {cols}")

    if write_stage is None:

        def write_stage(df: DataFrame, stage_table: str) -> None:
            w = df.write.mode("overwrite").format("jdbc").option("url", url).option(
                "dbtable", stage_table
            )
            for pk, pv in (properties or {}).items():
                w = w.option(pk, pv)
            if num_partitions:
                w = w.option("numPartitions", str(num_partitions))
            w.save()

    executed: list[str] = []
    # overwrite semantics make a retried epoch re-stage cleanly
    write_stage(batch_df, stage)
    stmt = insert_ignore_sql(table, stage, cols, keys, dialect)
    run(stmt)
    executed.append(stmt)
    drop = f"DROP TABLE IF EXISTS {quote_ident(stage, dialect)}"
    run(drop)
    executed.append(drop)
    return executed


def antijoin_upsert_ignore(
    batch_df: DataFrame,
    existing_keys: DataFrame,
    keys: tuple[str, ...] = ("time", "symbol"),
) -> DataFrame:
    """Dialect-free fallback: rows of ``batch_df`` whose key is NOT
    already present.  ``existing_keys`` should be a key-column-only JDBC
    scan (``spark.read.jdbc(...).select(*keys)`` — column pruning reaches
    the remote query) so only fixed-width keys cross the network.  The
    caller appends the result.  Weaker than the server-side conflict
    insert: not atomic against a concurrent writer racing the same key."""
    return batch_df.join(existing_keys.select(*keys).distinct(), on=list(keys), how="left_anti")


def streaming_jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    keys: tuple[str, ...] = ("time", "symbol"),
    checkpoint_dir: str | None = None,
    dialect: str = "postgresql",
    properties: dict | None = None,
    run_sql: Callable[[str], None] | None = None,
    write_stage: Callable[[DataFrame, str], None] | None = None,
):
    """``writeStream`` wiring for the JDBC sink: each micro-batch runs the
    stage + conflict-insert + drop cycle keyed by its epoch, so replayed
    epochs (at-least-once) land effectively-once — the JDBC twin of
    ``run_replay_pipeline``'s parquet ``upsert_ignore`` foreachBatch."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        jdbc_upsert_ignore(
            batch_df,
            url,
            table,
            keys,
            epoch_id=epoch_id,
            dialect=dialect,
            properties=properties,
            run_sql=run_sql,
            write_stage=write_stage,
        )

    w = df.writeStream.foreachBatch(write_batch)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w
