"""JDBC sink adapter: statement generation, idempotent stage->conflict-
insert->drop cycle, anti-join fallback, and streaming wiring — driven
with injected executors (no driver jar ships in this container; the
injection points are the documented deployment seam)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from trading_etl_python_spark.sinks import jdbc as J


def test_insert_ignore_sql_postgres_matches_reference_shape():
    """The postgres statement must be the reference's ON CONFLICT DO
    NOTHING (consumer.py:197-201) with a staged SELECT as the source."""
    sql = J.insert_ignore_sql(
        "stock_indicators",
        "stock_indicators__stage_7",
        ["time", "symbol", "close"],
        ("time", "symbol"),
    )
    assert sql == (
        'INSERT INTO "stock_indicators" ("time", "symbol", "close") '
        'SELECT "time", "symbol", "close" FROM "stock_indicators__stage_7" '
        'ON CONFLICT ("time", "symbol") DO NOTHING'
    )


def test_insert_ignore_sql_dialects():
    args = ("t", "t__stage_0", ["a", "b"], ("a",))
    # mysql: backtick quoting — default sql_mode rejects ANSI double quotes
    assert J.insert_ignore_sql(*args, dialect="mysql") == (
        "INSERT IGNORE INTO `t` (`a`, `b`) SELECT `a`, `b` FROM `t__stage_0`"
    )
    merge = J.insert_ignore_sql(*args, dialect="ansi")
    assert merge.startswith('MERGE INTO "t" t USING') and "WHEN NOT MATCHED" in merge
    with pytest.raises(ValueError):
        J.insert_ignore_sql(*args, dialect="oracle8i")
    with pytest.raises(ValueError):
        J.quote_ident('bad"name')
    with pytest.raises(ValueError):
        J.quote_ident("bad`name", dialect="mysql")


def test_quote_ident_schema_qualified():
    """A schema-qualified table stays a qualified reference — each part
    quoted separately, per dialect."""
    assert J.quote_ident("public.stock_indicators") == '"public"."stock_indicators"'
    assert J.quote_ident("db.t", dialect="mysql") == "`db`.`t`"
    assert J.quote_ident("plain") == '"plain"'
    with pytest.raises(ValueError):
        J.quote_ident("a.b.c")  # deeper than schema.table
    with pytest.raises(ValueError):
        J.quote_ident("a..b")  # empty part
    # the derived staging name keeps the schema prefix
    sql = J.insert_ignore_sql(
        "public.ind", J.stage_table_name("public.ind", 3), ["a"], ("a",)
    )
    assert 'FROM "public"."ind__stage_3"' in sql and 'INTO "public"."ind"' in sql


def test_jdbc_upsert_ignore_cycle_and_idempotent_retry(spark):
    """One epoch = stage overwrite + ONE set-based conflict insert +
    drop; a retried epoch re-runs the identical cycle against the same
    staging name (overwrite semantics), so the PK makes it a no-op."""
    df = spark.createDataFrame([(1, "A", 10.0), (2, "B", 20.0)], "time int, symbol string, close double")
    staged, stmts = [], []
    out = J.jdbc_upsert_ignore(
        df, "jdbc:postgresql://db/x", "ind", ("time", "symbol"),
        epoch_id=42,
        run_sql=stmts.append,
        write_stage=lambda bdf, stage: staged.append((stage, bdf.count())),
    )
    assert staged == [("ind__stage_42", 2)]
    assert [s.split()[0] for s in stmts] == ["INSERT", "DROP"]
    assert out == stmts
    assert "ON CONFLICT" in stmts[0] and "ind__stage_42" in stmts[0]
    # retry of the same epoch: same staging table, same statements
    stmts2 = []
    J.jdbc_upsert_ignore(
        df, "jdbc:postgresql://db/x", "ind", ("time", "symbol"),
        epoch_id=42, run_sql=stmts2.append,
        write_stage=lambda bdf, stage: None,
    )
    assert stmts2 == stmts


def test_jdbc_upsert_ignore_missing_key_raises(spark):
    df = spark.createDataFrame([(1,)], "time int")
    with pytest.raises(ValueError, match="symbol"):
        J.jdbc_upsert_ignore(df, "jdbc:x", "t", ("time", "symbol"), run_sql=lambda s: None,
                             write_stage=lambda d, s: None)


def test_antijoin_fallback_matches_parquet_upsert_semantics(spark):
    """The dialect-free path keeps exactly the not-yet-present keys —
    the same first-writer-wins contract as sinks.parquet.upsert_ignore."""
    batch = spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", 2.0), (3, "A", 3.0)], "time int, symbol string, close double"
    )
    existing = spark.createDataFrame([(1, "A"), (9, "Z")], "time int, symbol string")
    out = J.antijoin_upsert_ignore(batch, existing, ("time", "symbol"))
    assert sorted((r.time, r.symbol) for r in out.collect()) == [(2, "B"), (3, "A")]


def test_streaming_jdbc_sink_effectively_once(spark):
    """foreachBatch wiring: every micro-batch runs its own epoch-keyed
    cycle; the sink sees one INSERT+DROP pair per epoch."""
    calls = []

    def record_sql(sql):
        calls.append(sql)

    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 5)
        .load()
        .select(
            F.col("value").alias("time"),
            F.lit("S").alias("symbol"),
            (F.col("value") * 1.0).alias("close"),
        )
    )
    with tempfile.TemporaryDirectory(prefix="ckpt_jdbc_") as ckpt:
        q = (
            J.streaming_jdbc_sink(
                stream, "jdbc:postgresql://db/x", "ind", ("time", "symbol"),
                checkpoint_dir=ckpt,
                run_sql=record_sql,
                write_stage=lambda bdf, stage: bdf.count(),
            )
            .trigger(processingTime="0 seconds")
            .start()
        )
        import time as _t

        deadline = _t.time() + 30
        while len(calls) < 4 and _t.time() < deadline:
            _t.sleep(0.3)
        q.stop()
    inserts = [c for c in calls if c.startswith("INSERT")]
    drops = [c for c in calls if c.startswith("DROP")]
    assert len(inserts) >= 2 and len(drops) >= 2
    # distinct epochs stage to distinct tables
    assert len({c.split("FROM")[1].split()[0] for c in inserts}) == len(inserts)
