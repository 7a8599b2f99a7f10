"""S10: COG-style tiled GeoTIFF source (and a writer for tests/packaging).

The reference's ecosystem packages DEMs from GeoTIFF/COG sources; this
container has no GDAL, so the engine carries a minimal pure-binary TIFF 6.0
parser covering exactly the cloud-optimized raster shape:

- little-endian classic TIFF, single IFD
- tiled layout (TileWidth/TileLength/TileOffsets/TileByteCounts tags) —
  the COG access pattern IS per-tile HTTP range reads; locally the executors
  range-read the same offsets from the file
- BitsPerSample 32, SampleFormat 2 (int32 samples, the GVRS element type)
- Compression 1 (none) or 8 (zlib/Deflate, what COG elevation products use)
- georeferencing from ModelPixelScaleTag (33550) + ModelTiepointTag (33922),
  mapped onto GridSpec's cell-center convention

Reading is Spark-first: the DRIVER parses only the IFD (a few KB), builds a
DataFrame of tile descriptors, and an Arrow kernel range-reads + inflates
each tile on the executors — tiles never pass through the driver. The
result matches store.build_tiles output, so every downstream operator
(point_read, block_read, compression race, B-spline) runs unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gridfour_spark.spec import GridSpec

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_SAMPLES_PER_PIXEL = 277
_SAMPLE_FORMAT = 339
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_DOUBLE = 12


def write_geotiff(
    path: str,
    cells: np.ndarray,
    spec: GridSpec,
    tile_w: int = 256,
    tile_h: int = 256,
    compress: bool = True,
) -> None:
    """Write an int32 grid as a tiled (COG-layout) GeoTIFF.

    Row 0 of `cells` is grid row 0; the tiepoint maps raster (0,0) EDGE to
    the model coordinate of cell (0,0)'s upper-left corner using GridSpec's
    cell-center origin convention."""
    nr, nc = cells.shape
    v = cells.astype("<i4")
    tiles_across = (nc + tile_w - 1) // tile_w
    tiles_down = (nr + tile_h - 1) // tile_h
    payloads = []
    for tr in range(tiles_down):
        for tc in range(tiles_across):
            block = np.zeros((tile_h, tile_w), dtype="<i4")
            r0, c0 = tr * tile_h, tc * tile_w
            r1, c1 = min(r0 + tile_h, nr), min(c0 + tile_w, nc)
            block[: r1 - r0, : c1 - c0] = v[r0:r1, c0:c1]
            raw = block.tobytes()
            payloads.append(zlib.compress(raw, 6) if compress else raw)

    n_tiles = len(payloads)
    # header + IFD layout
    entries = []  # (tag, type, count, value_or_offset_placeholder)
    # out-of-line data area starts after header(8) + ifd(2 + 12*n + 4)
    n_entries = 12
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_entries + 4

    # out-of-line blocks: tile offsets, byte counts, pixel scale, tiepoint
    offsets_pos = data_off
    counts_pos = offsets_pos + 4 * n_tiles
    scale_pos = counts_pos + 4 * n_tiles
    tie_pos = scale_pos + 8 * 3
    tiles_pos = tie_pos + 8 * 6

    tile_offsets = []
    p = tiles_pos
    for pl in payloads:
        tile_offsets.append(p)
        p += len(pl)

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    entries.append(entry(_IMAGE_WIDTH, _TYPE_LONG, 1, nc))
    entries.append(entry(_IMAGE_LENGTH, _TYPE_LONG, 1, nr))
    entries.append(entry(_BITS_PER_SAMPLE, _TYPE_SHORT, 1, 32))
    entries.append(entry(_COMPRESSION, _TYPE_SHORT, 1, 8 if compress else 1))
    entries.append(entry(_PHOTOMETRIC, _TYPE_SHORT, 1, 1))
    entries.append(entry(_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, 1))
    entries.append(entry(_TILE_WIDTH, _TYPE_SHORT, 1, tile_w))
    entries.append(entry(_TILE_LENGTH, _TYPE_SHORT, 1, tile_h))
    entries.append(entry(_TILE_OFFSETS, _TYPE_LONG, n_tiles, offsets_pos))
    entries.append(entry(_TILE_BYTE_COUNTS, _TYPE_LONG, n_tiles, counts_pos))
    entries.append(entry(_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, 3, scale_pos))
    entries.append(entry(_MODEL_TIEPOINT, _TYPE_DOUBLE, 6, tie_pos))

    # tiepoint: raster (0,0,0) -> model upper-left EDGE of cell (0,0).
    # GridSpec: (x0, y0) is the CENTER of cell (0,0) and row 0 is the
    # y0 edge of the grid; GeoTIFF rasters are stored north-up (row 0 = max
    # y), so we store rows in grid order and a NEGATIVE... — we keep row 0 =
    # grid row 0 with +y scale via the tiepoint convention below.
    sx, sy = spec.cell_size_x, spec.cell_size_y
    ulx = spec.x0 - sx / 2.0
    uly = spec.y0 - sy / 2.0

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        f.write(struct.pack("<H", n_entries))
        for e in entries:
            f.write(e)
        f.write(struct.pack("<I", 0))  # next IFD
        f.write(struct.pack(f"<{n_tiles}I", *tile_offsets))
        f.write(struct.pack(f"<{n_tiles}I", *[len(pl) for pl in payloads]))
        f.write(struct.pack("<3d", sx, sy, 0.0))
        f.write(struct.pack("<6d", 0.0, 0.0, 0.0, ulx, uly, 0.0))
        for pl in payloads:
            f.write(pl)


def parse_ifd(path: str) -> dict:
    """Driver-side IFD parse (metadata-sized read)."""
    with open(path, "rb") as f:
        head = f.read(8)
        order, magic, ifd_off = struct.unpack("<2sHI", head)
        if order != b"II" or magic != 42:
            raise ValueError("only little-endian classic TIFF supported")
        f.seek(ifd_off)
        (n,) = struct.unpack("<H", f.read(2))
        raw = f.read(12 * n)
        tags = {}
        for i in range(n):
            tag, typ, count, val = struct.unpack_from("<HHII", raw, 12 * i)
            tags[tag] = (typ, count, val)

        def read_array(tag, fmt, size):
            typ, count, val = tags[tag]
            if count * size <= 4:
                return [val]
            f.seek(val)
            return list(struct.unpack(f"<{count}{fmt}", f.read(count * size)))

        info = {
            "width": tags[_IMAGE_WIDTH][2],
            "height": tags[_IMAGE_LENGTH][2],
            "bits": tags[_BITS_PER_SAMPLE][2],
            "compression": tags[_COMPRESSION][2],
            "tile_w": tags[_TILE_WIDTH][2],
            "tile_h": tags[_TILE_LENGTH][2],
            "tile_offsets": read_array(_TILE_OFFSETS, "I", 4),
            "tile_counts": read_array(_TILE_BYTE_COUNTS, "I", 4),
        }
        if info["bits"] != 32:
            raise ValueError("only 32-bit samples supported")
        if info["compression"] not in (1, 8):
            raise ValueError("only uncompressed/deflate tiles supported")
        if _MODEL_PIXEL_SCALE in tags:
            info["pixel_scale"] = read_array(_MODEL_PIXEL_SCALE, "d", 8)
            info["tiepoint"] = read_array(_MODEL_TIEPOINT, "d", 8)
        return info


def spec_from_geotiff(path: str, n_rows_in_tile: int | None = None, n_cols_in_tile: int | None = None) -> GridSpec:
    """GridSpec from the IFD's geo tags (tiepoint edge -> cell-center x0/y0)."""
    info = parse_ifd(path)
    sx, sy = info["pixel_scale"][0], info["pixel_scale"][1]
    ulx, uly = info["tiepoint"][3], info["tiepoint"][4]
    return GridSpec(
        n_rows=info["height"],
        n_cols=info["width"],
        n_rows_in_tile=n_rows_in_tile or info["tile_h"],
        n_cols_in_tile=n_cols_in_tile or info["tile_w"],
        x0=ulx + sx / 2.0,
        y0=uly + sy / 2.0,
        cell_size_x=sx,
        cell_size_y=sy,
    )


def read_geotiff_cells(spark: SparkSession, path: str) -> DataFrame:
    """GeoTIFF -> cells(row, col, z) DataFrame.

    The driver ships only tile DESCRIPTORS (offset, length, tile coords);
    executors range-read and inflate their tiles in an Arrow kernel — the
    COG access pattern (per-tile range requests) expressed as a Spark scan.
    Feed the result to store.build_tiles to re-tile into any GVRS spec."""
    info = parse_ifd(path)
    nr, nc = info["height"], info["width"]
    tw, th = info["tile_w"], info["tile_h"]
    comp = info["compression"]
    tiles_across = (nc + tw - 1) // tw
    desc = [
        (int(i), int(i // tiles_across), int(i % tiles_across), int(off), int(cnt))
        for i, (off, cnt) in enumerate(zip(info["tile_offsets"], info["tile_counts"]))
    ]
    ddf = spark.createDataFrame(
        desc, "tile_id int, tiff_tile_row int, tiff_tile_col int, offset long, length int"
    )

    def kernel(batches):
        f = open(path, "rb")
        try:
            for pdf in batches:
                outs = []
                for _, row in pdf.iterrows():
                    f.seek(row["offset"])
                    buf = f.read(row["length"])
                    if comp == 8:
                        buf = zlib.decompress(buf)
                    block = np.frombuffer(buf, dtype="<i4").reshape(th, tw)
                    r0 = row["tiff_tile_row"] * th
                    c0 = row["tiff_tile_col"] * tw
                    h = min(th, nr - r0)
                    w = min(tw, nc - c0)
                    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                    outs.append(
                        pd.DataFrame(
                            {
                                "row": (r0 + rr).ravel().astype(np.int64),
                                "col": (c0 + cc).ravel().astype(np.int64),
                                "z": block[:h, :w].ravel().astype(np.float64),
                            }
                        )
                    )
                yield pd.concat(outs) if outs else pd.DataFrame(
                    {"row": [], "col": [], "z": []}
                )
        finally:
            f.close()

    return ddf.repartition(max(2, min(len(desc), 32)), "tile_id").mapInPandas(
        kernel, "row long, col long, z double"
    )
