from __future__ import annotations

from pyspark.sql import functions as F

from trading_etl_python_spark.operators.transforms import (
    TICK_WIRE_SCHEMA,
    json_decode,
    json_encode_wire,
)


def test_wire_roundtrip_encode_decode(spark):
    """S2 produce + S4 consume compose to identity on the payload."""
    ticks = spark.createDataFrame(
        [("TCS", 3501.5, 1731834000000, 1731834000500), ("INFY", 1450.0, 1731834005000, 1731834005400)],
        "symbol string, price double, timestamp long, fetched_at long",
    )
    wire = json_encode_wire(ticks)
    assert wire.columns == ["key", "value"]
    assert dict(wire.dtypes) == {"key": "binary", "value": "binary"}
    back = (
        json_decode(wire.select(F.col("value").cast("string").alias("v")), "v", TICK_WIRE_SCHEMA)
        .select("_decoded.*")
    )
    assert sorted(back.collect()) == sorted(ticks.collect())


def test_wire_key_preserves_symbol(spark):
    ticks = spark.createDataFrame(
        [("FAKE", 1.0, 1731834000000, 1731834000000)],
        "symbol string, price double, timestamp long, fetched_at long",
    )
    row = json_encode_wire(ticks).collect()[0]
    assert bytes(row.key) == b"FAKE"  # keyed by symbol (producer.py:89)


def test_decode_isolates_bad_messages(spark):
    """T7 — one corrupt message becomes a NULL struct, the batch survives."""
    raw = spark.createDataFrame(
        [('{"symbol":"A","price":1.0,"timestamp":1,"fetched_at":2}',), ("not json at all",)],
        "v string",
    )
    out = json_decode(raw, "v", TICK_WIRE_SCHEMA)
    got = {r.s for r in out.select(F.col("_decoded.symbol").alias("s")).collect()}
    assert got == {"A", None}
