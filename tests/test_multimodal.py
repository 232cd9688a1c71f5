from __future__ import annotations

import pytest

from trading_etl_python_spark.operators import multimodal as M
from trading_etl_python_spark.sources.tables import load_table


def test_media_adapter_schema(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = M.documents_as_media(docs)
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"


def test_decode_media_fake_codec(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    feats = M.decode_media(M.documents_as_media(docs)).collect()
    assert len(feats) == 20
    for r in feats:
        assert r.n_bytes > 0
        assert len(r.feat) == 8
        assert sum(r.feat) == pytest.approx(1.0, abs=1e-6)  # normalized histogram


def test_decode_media_real_codec_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(NotImplementedError):
        M.decode_media(M.documents_as_media(docs), codec="jpeg")


def test_metadata_stats_prunes_payload(spark, sf_dir):
    """The metadata aggregate must not read the payload bytes: column
    pruning is the whole point of splitting metadata out."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.documents_as_media(docs)
    plan = M.media_metadata_stats(media)._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


def test_frame_sample_stride_and_content(spark):
    payload = bytes(range(256)) * 4  # 1024 bytes = 16 frames of 64
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    frames = {r.frame_idx: bytes(r.frame) for r in M.frame_sample(df, every_n=4, frame_bytes=64).collect()}
    assert sorted(frames) == [0, 4, 8, 12]  # every 4th of 16 frames
    assert frames[0] == payload[:64]
    assert frames[12] == payload[12 * 64 : 13 * 64]


def test_frame_sample_short_and_null_payloads(spark):
    df = spark.createDataFrame(
        [(1, b"tiny"), (2, None), (3, b"x" * 64)], "media_id long, payload binary"
    )
    rows = M.frame_sample(df, every_n=1, frame_bytes=64).collect()
    assert [(r.media_id, r.frame_idx) for r in rows] == [(3, 0)]


def test_frame_sample_real_codec_raises(spark):
    df = spark.createDataFrame([(1, b"")], "media_id long, payload binary")
    with pytest.raises(NotImplementedError):
        M.frame_sample(df, codec="mp4")


def test_resize_stub_updates_meta(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = M.resize_stub(M.documents_as_media(docs), 256, 128)
    row = media.select("meta.width", "meta.height").collect()[0]
    assert (row.width, row.height) == (256, 128)
