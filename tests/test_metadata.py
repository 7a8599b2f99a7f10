"""Metadata records: typed key->payload with replace-on-write upsert (S11)."""

from gridfour_spark import metadata as M


def test_metadata_upsert_and_read(spark):
    meta = M.make_metadata(
        spark,
        [
            (M.WKT, 0, "STRING", None, 'GEOGCS["WGS 84"]'),
            (M.COPYRIGHT, 0, "STRING", None, "public domain"),
            ("Elevations", 1, "INTEGER", bytes([1, 2, 3, 4]), None),
        ],
    )
    up = M.make_metadata(spark, [(M.WKT, 0, "STRING", None, 'GEOGCS["NAD 83"]')])
    merged = M.upsert_metadata(meta, up)
    assert merged.count() == 3  # replaced, not appended
    wkt = M.read_metadata(merged, M.WKT, 0).collect()
    assert len(wkt) == 1 and wkt[0].text == 'GEOGCS["NAD 83"]'
    payload = M.read_metadata(merged, "Elevations").collect()[0].payload
    assert bytes(payload) == bytes([1, 2, 3, 4])
