"""Interleaved-docs synthesis: span-sequence invariant, determinism across
partitionings, geometry stability (the input_hint per-row invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridfour_spark import synth
from tests.conftest import SF_SMOKE


def test_spans_schema_and_interleaving(spark):
    il = synth.docs_interleaved(spark, SF_SMOKE)
    fields = {f.name: f.dataType.simpleString() for f in il.schema["spans"].dataType.elementType.fields}
    assert fields == {"kind": "string", "text": "string", "media_ref": "string", "offset": "int"}
    row = il.filter(F.size("spans") >= 5).first()
    spans = row.spans
    assert [s.offset for s in spans] == list(range(len(spans)))
    for s in spans:
        if s.offset % 5 == 4:
            assert s.kind == "media" and s.media_ref.startswith("media://") and s.text == ""
        else:
            assert s.kind == "text" and s.media_ref == "" and s.text


def test_span_sequence_equality_under_repartition(spark):
    """Shuffling/repartitioning must not disturb per-row span sequences."""
    base = synth.docs_spans(spark, SF_SMOKE)
    fp = lambda df: {  # noqa: E731
        r.doc_id: r.fp
        for r in df.groupBy("doc_id")
        .agg(
            F.md5(
                F.to_binary(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("span_offset", "kind", "text", "media_ref"))
                            ),
                            lambda s: F.concat_ws("#", s.kind, s.text, s.media_ref, s.span_offset),
                        ),
                        "|",
                    ),
                    F.lit("utf-8"),
                )
            ).alias("fp")
        )
        .collect()
    }
    a = fp(base)
    b = fp(base.repartition(64, "media_ref"))
    assert a == b and len(a) == 500


def test_geometry_deterministic_across_partitionings(spark):
    g1 = synth.with_span_geometry(synth.docs_spans(spark, SF_SMOKE))
    g2 = synth.with_span_geometry(synth.docs_spans(spark, SF_SMOKE).repartition(97))
    a = {(r.doc_id, r.span_offset): (r.lat, r.lon) for r in g1.collect()}
    b = {(r.doc_id, r.span_offset): (r.lat, r.lon) for r in g2.collect()}
    assert a == b
    lats = [v[0] for v in a.values()]
    lons = [v[1] for v in a.values()]
    assert all(-90 <= la < 90 for la in lats)
    assert all(-180 <= lo < 180 for lo in lons)


def test_hot_city_skew_present(spark):
    """~30% of spans land within 1 degree of the 4 hot cities (skew fixture)."""
    g = synth.with_span_geometry(synth.docs_spans(spark, SF_SMOKE))
    cities = [(40.7, -74.0), (51.5, -0.1), (35.7, 139.7), (-33.9, 18.4)]
    cond = None
    for la, lo in cities:
        c = (F.abs(F.col("lat") - la) <= 1.0) & (F.abs(F.col("lon") - lo) <= 1.0)
        cond = c if cond is None else (cond | c)
    total = g.count()
    hot = g.filter(cond).count()
    assert 0.25 < hot / total < 0.35
