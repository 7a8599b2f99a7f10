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

# GVRS Metadata Naming Convention: name -> required type tag
# (GvrsMetadataNames.java enum bodies; type codes GvrsMetadataType.java:49-96).
# TIFF records are UNSPECIFIED by convention with record_id = the TIFF tag id.
WELL_KNOWN_TYPES = {
    "Author": "string",
    "Copyright": "string",
    "TermsOfUse": "string",
    "Disclaimers": "string",
    "TIFF": "unspecified",
    "WKT": "string",
    "GvrsJavaCodecs": "ascii",
    "GvrsCompressionCodecs": "ascii",
}

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


# --- well-known-name typed accessors (GvrsMetadataNames semantics) ----------

def put_well_known(
    meta: DataFrame, name: str, text: str, record_id: int = 0
) -> DataFrame:
    """Upsert a well-known record, enforcing the MNC type tag for the name
    (a WKT record is always STRING, GvrsJavaCodecs always ASCII, ...)."""
    mtype = WELL_KNOWN_TYPES.get(name)
    if mtype is None:
        raise ValueError(f"not a well-known metadata name: {name!r}")
    if mtype == "unspecified":
        raise ValueError(f"{name} carries a binary payload; use upsert_metadata")
    spark = meta.sparkSession
    upd = spark.createDataFrame([(name, record_id, mtype, None, text)], META_SCHEMA)
    return upsert_metadata(meta, upd)


def get_well_known(meta: DataFrame, name: str, record_id: int = 0) -> DataFrame:
    """Typed read of a well-known record: rows whose stored type tag
    disagrees with the MNC (e.g. a binary payload filed under WKT) are
    EXCLUDED, mirroring GvrsMetadataNames' type contract."""
    mtype = WELL_KNOWN_TYPES.get(name)
    if mtype is None:
        raise ValueError(f"not a well-known metadata name: {name!r}")
    out = read_metadata(meta, name, record_id)
    if mtype in ("string", "ascii"):
        # STRING and ASCII are mutually readable (both text); any other tag
        # is a contract violation for this name
        out = out.filter(F.lower("mtype").isin("string", "ascii"))
    else:
        out = out.filter(F.lower("mtype") == mtype)
    return out.select("name", "record_id", "mtype", "text")


def put_wkt(meta: DataFrame, wkt_text: str, record_id: int = 0) -> DataFrame:
    return put_well_known(meta, WKT, wkt_text, record_id)


def get_wkt(meta: DataFrame, record_id: int = 0) -> DataFrame:
    return get_well_known(meta, WKT, record_id)
