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


def test_resize_stub_updates_meta(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = M.resize_stub(M.documents_as_media(docs), 256, 128)
    row = media.select("meta.width", "meta.height").collect()[0]
    assert (row.width, row.height) == (256, 128)
