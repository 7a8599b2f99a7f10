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


def test_well_known_typed_accessors(spark):
    """MNC contract (GvrsMetadataNames.java): WKT is STRING, GvrsJavaCodecs
    is ASCII; typed reads exclude mistyped rows, typed writes stamp the tag."""
    meta = M.make_metadata(spark, [(M.COPYRIGHT, 0, "string", None, "pd")])
    meta = M.put_wkt(meta, 'GEOGCS["WGS 84",DATUM["WGS_1984"]]')
    rows = M.get_wkt(meta).collect()
    assert len(rows) == 1
    assert rows[0].text == 'GEOGCS["WGS 84",DATUM["WGS_1984"]]'
    assert rows[0].mtype == "string"

    # replace-on-write through the typed path
    meta = M.put_wkt(meta, 'PROJCS["UTM 10N"]')
    rows = M.get_wkt(meta).collect()
    assert len(rows) == 1 and rows[0].text == 'PROJCS["UTM 10N"]'

    # a mistyped row filed under WKT is excluded by the typed read
    bad = M.make_metadata(spark, [(M.WKT, 7, "integer", bytes([1, 2]), None)])
    merged = M.upsert_metadata(meta, bad)
    assert M.get_wkt(merged, record_id=7).count() == 0

    import pytest

    with pytest.raises(ValueError, match="well-known"):
        M.put_well_known(meta, "NotAName", "x")
    with pytest.raises(ValueError, match="binary payload"):
        M.put_well_known(meta, "TIFF", "x")


def test_well_known_from_reference_sample(spark):
    """The reference's SampleMetadata.gvrs loads into the Spark metadata
    table and the ASCII well-known records read through the typed accessor
    (GvrsJavaCodecs / GvrsCompressionCodecs, GvrsMetadataNames.java)."""
    import os

    from gridfour_spark import gvrsfile as G

    path = "/root/reference/core/src/test/resources/org/gridfour/gvrs/SampleFiles/SampleMetadata.gvrs"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference sample files not present")
    recs = G.read_metadata(path)
    rows = [
        (r["name"], r["record_id"], r["type"], None,
         r["value"] if isinstance(r["value"], str) else str(r["value"]))
        for r in recs
    ]
    meta = M.make_metadata(spark, rows)
    codecs = M.get_well_known(meta, "GvrsCompressionCodecs").collect()
    assert len(codecs) == 1
    assert codecs[0].text == "GvrsHuffman|GvrsDeflate|GvrsFloat"
    java = M.get_well_known(meta, "GvrsJavaCodecs").collect()
    assert len(java) == 1 and java[0].text.startswith("GvrsHuffman,org.gridfour")
