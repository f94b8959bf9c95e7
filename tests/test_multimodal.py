"""Arrow-native (mapInArrow) media byte stats — zero-copy binary access."""

from __future__ import annotations

from fest_vibes_ai_etl_spark.operators import multimodal


def test_media_byte_stats_arrow_matches_python(spark):
    docs = spark.createDataFrame(
        [(1, "aa"), (2, "bbbb")], "doc_id long, text string"
    )
    media = multimodal.attach_fake_media(docs, "doc_id", "text")
    got = {r.doc_id: (r.n_bytes, r.checksum)
           for r in multimodal.media_byte_stats_arrow(media).collect()}
    want = {}
    for r in media.select("doc_id", "media").collect():
        b = bytes(r.media)
        want[r.doc_id] = (len(b), sum(b[:: max(1, len(b) // 64)]) % 65536)
    assert got == want and len(got) == 2


def test_real_container_synthesis_and_header_decode(spark):
    """synth_real_media emits genuinely parseable containers (PNG/WAV/
    YUV4MPEG2) and decode_media_headers recovers the real dimensions/frame
    counts from the BYTES — cross-checked against an independent stdlib
    parse of the same blobs."""
    import hashlib
    import io
    import struct
    import wave

    from fest_vibes_ai_etl_spark.operators import multimodal
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(60)
    media = multimodal.synth_real_media(docs, "doc_id", "text")
    blobs = {r.doc_id: (r.media_type, bytes(r.media)) for r in media.collect()}
    assert {t for t, _ in blobs.values()} == {"image", "audio", "video"}

    decoded = {
        r.doc_id: r
        for r in multimodal.decode_media_headers(media).collect()
    }
    assert set(decoded) == set(blobs)
    for doc_id, (kind, blob) in blobs.items():
        d = decoded[doc_id]
        assert d.content_digest == hashlib.md5(blob).hexdigest()
        if kind == "image":
            assert blob[:8] == b"\x89PNG\r\n\x1a\n"
            w, h = struct.unpack(">II", blob[16:24])
            assert (d.width, d.height, d.n_frames) == (w, h, 1)
        elif kind == "audio":
            with wave.open(io.BytesIO(blob)) as wv:
                assert d.n_frames == wv.getnframes() > 0
            assert d.width is None and d.height is None
        else:
            assert blob[:9] == b"YUV4MPEG2"
            assert d.n_frames == blob.count(b"FRAME\n") >= 1
            assert (d.width, d.height) == (8, 8)


def test_header_decode_quarantines_garbage(spark):
    from fest_vibes_ai_etl_spark.operators import multimodal

    junk = spark.createDataFrame(
        [(1, "image", bytearray(b"not a real container"))],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_media_headers(junk).collect()[0]
    assert row.width is None and row.n_frames is None
    assert row.byte_len == 20  # row survives with null metadata
