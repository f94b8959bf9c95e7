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
