"""Metadata records (S11): typed key -> payload table.

Reference: gvrs/GvrsMetadata.java:67-114 — records keyed by (name, recordID)
with a type tag and payload; well-known names incl. WKT, Copyright,
GvrsJavaCodecs (gvrs/GvrsMetadataNames.java:59-110). Read/write API:
GvrsFile.readMetadata/writeMetadata (GvrsFile.java:967-1111).

Spark re-expression: a small table (name, record_id, mtype, payload binary,
text) with upsert semantics on the (name, record_id) key — last write wins,
like the reference's replace-on-write. Production target: Iceberg MERGE INTO;
here an anti-join union, which is the same logical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# well-known metadata names (GvrsMetadataNames.java:59-110)
WKT = "WKT"
COPYRIGHT = "Copyright"
PRODUCT = "Product"
SOURCE = "Source"

META_SCHEMA = "name string, record_id int, mtype string, payload binary, text string"


def make_metadata(spark: SparkSession, records: list[tuple]) -> DataFrame:
    """records: (name, record_id, mtype, payload_bytes|None, text|None)."""
    return spark.createDataFrame(records, META_SCHEMA)


def upsert_metadata(existing: DataFrame, updates: DataFrame) -> DataFrame:
    """Replace-on-write keyed by (name, record_id)."""
    keep = existing.join(updates.select("name", "record_id"), ["name", "record_id"], "left_anti")
    return keep.unionByName(updates)


def read_metadata(meta: DataFrame, name: str, record_id: int | None = None) -> DataFrame:
    out = meta.filter(F.col("name") == name)
    if record_id is not None:
        out = out.filter(F.col("record_id") == record_id)
    return out
