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


# ------------------------------------------------- real stdlib codecs


def _make_wav(freq_hz=440.0, sr=8000, n=4000, nch=1, amp=0.5):
    """Synthesize a PCM16 sine WAV with the stdlib wave module."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        frames = b"".join(
            struct.pack(
                "<" + "h" * nch,
                *([int(amp * 32767 * math.sin(2 * math.pi * freq_hz * i / sr))] * nch),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _make_pgm(w=8, h=4):
    """P5 grayscale gradient: pixel(r, c) = r * 10 + c."""
    header = b"P5\n%d %d\n255\n" % (w, h)
    return header + bytes(r * 10 + c for r in range(h) for c in range(w))


def test_wav_codec_decodes_real_pcm(spark):
    """The 'wav' codec is a REAL decoder: stdlib wave parse + numpy
    features.  A 440 Hz half-amplitude sine must probe with exact
    header values and produce RMS ~ amp/sqrt(2) per window."""
    import math

    payload = _make_wav(freq_hz=440.0, sr=8000, n=4000, amp=0.5)
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    probe = M.probe_media(df).collect()[0]
    assert (probe.format, probe.sample_rate, probe.n_channels) == ("wav", 8000, 1)
    assert probe.duration_ms == 500  # 4000 frames @ 8 kHz
    feat = M.decode_media(df, codec="wav").collect()[0].feat
    rms, zcr = feat[:4], feat[4:]
    for v in rms:
        assert abs(v - 0.5 / math.sqrt(2)) < 0.01
    # 440 Hz @ 8 kHz -> ~0.11 sign changes per sample
    for v in zcr:
        assert 0.08 < v < 0.14


def test_wav_codec_stereo_and_8bit(spark):
    payload = _make_wav(sr=4000, n=1000, nch=2)
    row = M.probe_media(
        spark.createDataFrame([(7, payload)], "media_id long, payload binary")
    ).collect()[0]
    assert (row.n_channels, row.sample_rate, row.duration_ms) == (2, 4000, 250)


def test_netpbm_codec_probe_features_and_true_resize(spark):
    """P5 parse, histogram features, and a REAL nearest-neighbor resize
    whose output re-parses with exact expected pixels."""
    import numpy as np

    payload = _make_pgm(w=8, h=4)
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    probe = M.probe_media(df).collect()[0]
    assert (probe.format, probe.width, probe.height, probe.n_channels) == ("pgm", 8, 4, 1)
    feat = M.decode_media(df, codec="pgm").collect()[0].feat
    assert abs(sum(feat) - 1.0) < 1e-9
    assert feat[0] > 0  # gradient starts at intensity 0
    # true resize: downsample 8x4 -> 4x2 and check exact NN pixels
    out = M.resize_media(df, width=4, height=2).collect()[0]
    im = M.parse_netpbm(bytes(out.payload))
    assert (im["width"], im["height"]) == (4, 2)
    src = np.array([[r * 10 + c for c in range(8)] for r in range(4)])
    rows = [min(int((i + 0.5) * 4 / 2), 3) for i in range(2)]
    cols = [min(int((j + 0.5) * 8 / 4), 7) for j in range(4)]
    assert im["pixels"][:, :, 0].tolist() == src[rows][:, cols].tolist()


def test_probe_media_isolates_malformed_payloads(spark):
    """Unknown/corrupt payloads probe as NULL format — one bad payload
    never fails the batch (T7 contract at the codec layer)."""
    good = _make_pgm()
    df = spark.createDataFrame(
        [(1, good), (2, b"P5\n9999 9999\n255\nshort"), (3, b"not media"), (4, None)],
        "media_id long, payload binary",
    )
    got = {r.media_id: r.format for r in M.probe_media(df).collect()}
    assert got == {1: "pgm", 2: None, 3: None, 4: None}


def test_media_dhash_collides_on_duplicates(spark):
    from trading_etl_python_spark.operators import multimodal as M

    base = "the quick brown fox jumps over the lazy dog " * 8   # > 288 chars
    near = base[:100] + "X" + base[101:]                        # 1-byte change
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, "zz " * 120)], ["doc_id", "text"]
    )
    out = {r["media_id"]: (r["dh_lo"], r["dh_hi"])
           for r in M.media_dhash(M.documents_as_pgm(docs)).collect()}
    assert out[0] == out[1]                      # exact duplicate collides

    def ham(a, b):
        return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")

    assert ham(out[0], out[2]) <= 4              # near-dup stays close
    assert ham(out[0], out[3]) > 8               # different content far


def test_media_dhash_pairs_find_duplicates(spark):
    from trading_etl_python_spark.operators import multimodal as M

    base = "alpha beta gamma delta epsilon zeta " * 10
    near = base[:50] + "Q" + base[51:]
    far = "zz qq ww ee rr tt yy uu ii oo pp " * 12
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sig = M.media_dhash(M.documents_as_pgm(docs))
    pairs = {(r["media_a"], r["media_b"]): r["hamming"]
             for r in M.media_dhash_pairs(sig).collect()}
    assert pairs[(0, 1)] == 0                    # exact dup: hamming 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 3  # near-dup caught
    assert (0, 3) not in pairs                   # unrelated image absent


def test_documents_as_wav_parses_with_stdlib(spark):
    from trading_etl_python_spark.operators import multimodal as M

    docs = spark.createDataFrame([(0, "hello world " * 30)], ["doc_id", "text"])
    payload = bytes(M.documents_as_wav(docs).collect()[0]["payload"])
    meta = M.parse_wav(payload)
    assert meta["sample_rate"] == 8000 and meta["n_channels"] == 1
    assert meta["n_frames"] == 256 and meta["sample_width"] == 1
    assert len(meta["samples"]) == 256
    # ascii text -> strictly negative samples after unsigned offset
    assert (meta["samples"] < 0).all()


# ------------------------------------------------------- PNG codec


def test_png_round_trip_all_shapes():
    import numpy as np

    rng = np.random.RandomState(42)
    for shape in [(16, 18), (7, 5, 3), (4, 4, 2), (3, 9, 4), (1, 1)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        im = M.parse_png(M.encode_png(px))
        ref = px if px.ndim == 3 else px[:, :, None]
        assert im["pixels"].shape == ref.shape
        assert (im["pixels"] == ref).all()
        assert im["width"] == ref.shape[1] and im["height"] == ref.shape[0]
        assert im["n_channels"] == ref.shape[2] and im["maxval"] == 255


def test_png_decodes_all_five_filter_types():
    """Hand-encode a PNG whose rows cycle filters 0..4 (our encoder only
    emits 0) and check the unfilter path reconstructs the pixels."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(7)
    w, h, c = 6, 5, 3
    px = rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    stride, raw, prev = w * c, b"", [0] * (w * c)
    for y in range(h):
        line = [int(v) for v in px[y].ravel()]
        f = y % 5
        enc = [f]
        for x in range(stride):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc2 = prev[x - c] if x >= c else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = (line[x] - a) & 0xFF
            elif f == 2:
                v = (line[x] - b) & 0xFF
            elif f == 3:
                v = (line[x] - (a + b) // 2) & 0xFF
            else:
                v = (line[x] - paeth(a, b, cc2)) & 0xFF
            enc.append(v)
        raw += bytes(enc)
        prev = line

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    p = (
        M.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (M.parse_png(p)["pixels"] == px).all()


def test_png_rejects_malformed_payloads():
    import numpy as np

    good = M.encode_png(np.zeros((4, 4), dtype=np.uint8))
    for bad in [
        b"",
        b"\x89PNG\r\n\x1a\x00" + good[8:],  # wrong signature byte
        good[:40],                            # truncated mid-chunk
        good[:20] + b"\xff" + good[21:],      # corrupt IHDR -> CRC fail
    ]:
        with pytest.raises(ValueError):
            M.parse_png(bad)


def test_probe_media_sniffs_png(spark):
    docs = spark.createDataFrame([(0, "hello " * 60)], ["doc_id", "text"])
    media = M.documents_as_png(docs)
    row = M.probe_media(media).collect()[0]
    assert row["format"] == "png"
    assert row["width"] == 18 and row["height"] == 16
    assert row["n_channels"] == 1


def test_png_and_pgm_dhash_identical(spark):
    """The same text grid must hash identically through either container
    — any inflate/unfilter bug in the PNG path changes the bits."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma " * 20), (1, "zz qq ww " * 30)],
        ["doc_id", "text"],
    )
    pgm = {r["media_id"]: (r["dh_lo"], r["dh_hi"])
           for r in M.media_dhash(M.documents_as_pgm(docs)).collect()}
    png = {r["media_id"]: (r["dh_lo"], r["dh_hi"])
           for r in M.media_dhash(M.documents_as_png(docs)).collect()}
    assert pgm == png


def test_decode_media_png_codec(spark):
    docs = spark.createDataFrame([(0, "x " * 200)], ["doc_id", "text"])
    out = M.decode_media(M.documents_as_png(docs), codec="png").collect()[0]
    assert len(out["feat"]) == 8
    assert abs(sum(out["feat"]) - 1.0) < 1e-6


def test_media_dhash_pairs_cap_inert_when_buckets_small(spark):
    """On a corpus whose band buckets are all <= m the cap is pure
    overhead-free identity: capped output == exact output (the semdedup
    max_cell inertness law applied to banding)."""
    from trading_etl_python_spark.operators import multimodal as M

    base = "alpha beta gamma delta epsilon zeta " * 10
    near = base[:50] + "Q" + base[51:]
    far = "zz qq ww ee rr tt yy uu ii oo pp " * 12
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sig = M.media_dhash(M.documents_as_pgm(docs))
    exact = {(r["media_a"], r["media_b"]): r["hamming"]
             for r in M.media_dhash_pairs(sig, max_bucket=None).collect()}
    capped = {(r["media_a"], r["media_b"]): r["hamming"]
              for r in M.media_dhash_pairs(sig, max_bucket=100).collect()}
    auto = {(r["media_a"], r["media_b"]): r["hamming"]
            for r in M.media_dhash_pairs(sig).collect()}
    assert capped == exact
    # 4 docs -> auto m = 4*ceil(sqrt(4)) = 8 >= any bucket: also inert
    assert auto == exact


def test_media_dhash_pairs_cap_superset_law(spark):
    """Capped pairs are a SUBSET of exact pairs (the cap only removes
    candidates, never invents them), every surviving pair verifies the
    hamming bound, and hamming-0 pairs (identical signatures -> same
    portable hash sub-group in every band) always survive the cap."""
    from trading_etl_python_spark.operators import multimodal as M

    base = "alpha beta gamma delta epsilon zeta " * 10
    # a skew-blown corpus: 40 exact copies pile into ONE bucket per band
    rows = [(i, base) for i in range(40)]
    rows += [(100 + i, f"doc {i} " + "xy " * (50 + i)) for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = M.media_dhash(M.documents_as_pgm(docs)).localCheckpoint()
    exact = {(r["media_a"], r["media_b"]): r["hamming"]
             for r in M.media_dhash_pairs(sig, max_bucket=None).collect()}
    capped = {(r["media_a"], r["media_b"]): r["hamming"]
              for r in M.media_dhash_pairs(sig, max_bucket=5).collect()}
    assert set(capped) <= set(exact)
    assert all(capped[k] == exact[k] for k in capped)
    assert all(h <= 3 for h in capped.values())
    # identical signatures share the id-hash ONLY within a sub-group --
    # but identical PAYLOADS with different ids can land in different
    # subs, so hamming-0 recall under the cap is per-sub-group: verify
    # the capped run still finds a non-trivial slice of the dup pile
    assert sum(1 for h in capped.values() if h == 0) >= 5


def test_media_dhash_pairs_max_bucket_validation(spark):
    from trading_etl_python_spark.operators import multimodal as M
    import pytest

    docs = spark.createDataFrame([(0, "x " * 100)], ["doc_id", "text"])
    sig = M.media_dhash(M.documents_as_pgm(docs))
    for bad in (0, -3, True, "bogus"):
        with pytest.raises(ValueError):
            M.media_dhash_pairs(sig, max_bucket=bad)
