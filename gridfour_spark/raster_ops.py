"""Raster analytic operators: stats, histogram/entropy, downsample, area/volume.

All pure DataFrame built-ins — Catalyst plans partial+final aggregation
automatically (the reference's Kahan compensated summation,
util/KahanSummation.java:55-77, is unnecessary under Spark's partitioned tree
aggregation; tests use tolerance asserts instead, SURVEY §4).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_stats(cells: DataFrame, value_col: str = "z") -> DataFrame:
    """Global min/max/avg/count (PackageData.java:445-448, 504-533)."""
    v = F.col(value_col)
    return cells.agg(
        F.min(v).alias("min_z"),
        F.max(v).alias("max_z"),
        F.round(F.avg(v), 6).alias("avg_z"),
        F.count(v).alias("n_cells"),
    )


def histogram(cells: DataFrame, value_col: str = "z", bin_size: int = 100) -> DataFrame:
    """Value-range histogram (InputDataStatCollector.java:42-100) — one
    map-side-combined groupBy; bins = floor(z / bin_size)."""
    b = F.floor(F.col(value_col) / F.lit(bin_size)).cast("long").alias("bin")
    return cells.groupBy(b).agg(F.count("*").alias("cnt")).orderBy("bin")


def entropy_bits(cells: DataFrame, value_col: str = "z") -> DataFrame:
    """Shannon entropy -sum(p*log2 p) over exact value counts
    (EntropyTabulator.java:58-182). Two aggregations, both map-side combined;
    the counts table at 100 TB stays bounded by value cardinality (int16-ish
    DEMs -> ~1e5 rows) so the final agg is a broadcast-scale reduce."""
    counts = cells.groupBy(F.col(value_col).alias("v")).agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("n")).select("n")
    joined = counts.crossJoin(F.broadcast(total))
    p = F.col("c") / F.col("n")
    return joined.agg(
        F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
        F.sum("c").alias("n_samples"),
    )


def grid_stats_with_entropy(cells: DataFrame, value_col: str = "z") -> DataFrame:
    """grid_stats + entropy_bits in ONE scan (round-8 optimization).

    The separate grid_stats x entropy_bits cross join evaluated the cell
    generator THREE times (stats agg, entropy counts, entropy total — the
    round-start plan shows three Range->dem-trig subtrees) through 5
    exchanges and 2 single-row broadcast crosses. Everything is derivable
    from the per-value counts table alone:

      min/max        : min/max of the distinct values
      avg            : sum(v * c) / count — z is integral, so every partial
                       double sum is exact (< 2^53) and the final division
                       is bit-identical to Spark's avg(z) accumulator
      n_cells        : sum(c) over non-null values (count(z) semantics)
      entropy        : -sum(p log2 p) with p = c / n, n via a single-
                       partition window over the counts (bounded by value
                       CARDINALITY, not cell count — ~1e5 rows for an
                       int16-ish DEM at any raster size, same bound the
                       entropy_bits docstring argues)
      n_samples      : sum(c) including the null group (old total)

    One scan, one map-side-combined exchange, one singleton window."""
    from pyspark.sql.window import Window

    v = F.col(value_col)
    counts = cells.groupBy(v.alias("v")).agg(F.count("*").alias("c"))
    t = counts.withColumn("n", F.sum("c").over(Window.partitionBy()))
    p = F.col("c") / F.col("n")
    nn_c = F.when(F.col("v").isNotNull(), F.col("c"))
    return t.agg(
        F.min("v").alias("min_z"),
        F.max("v").alias("max_z"),
        F.round(F.sum(F.col("v").cast("double") * F.col("c")) / F.sum(nn_c), 6).alias("avg_z"),
        F.sum(nn_c).alias("n_cells"),
        F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
        F.sum("c").alias("n_samples"),
    )


def downsample(
    cells: DataFrame,
    factor: int,
    value_col: str = "z",
    skip_fill: float | None = None,
) -> DataFrame:
    """factor x factor block mean per output cell (ExampleDownsample.java:164-205).

    Output cell (row//f, col//f); blocks containing a fill value are skipped
    entirely (the reference skips blocks with int fill, :183-189) when
    skip_fill is given. Single map-side-combined aggregation — at 100 TB this
    is the textbook partial-agg pattern, no pre-shuffle needed."""
    f = factor
    g = cells.groupBy(
        F.expr(f"CAST(row div {f} AS BIGINT)").alias("out_row"),
        F.expr(f"CAST(col div {f} AS BIGINT)").alias("out_col"),
    )
    if skip_fill is not None:
        agg = g.agg(
            F.round(F.avg(value_col), 6).alias("mean_z"),
            F.max(F.when(F.col(value_col) == F.lit(skip_fill), 1).otherwise(0)).alias("_has_fill"),
        )
        return agg.filter(F.col("_has_fill") == 0).drop("_has_fill")
    return g.agg(F.round(F.avg(value_col), 6).alias("mean_z"))


def cell_area_km2(lat: Column, cell_deg: float, r_earth_km: float = 6371.0072) -> Column:
    """Lat-dependent cell area (ExtractData.java:125-135): the reference
    computes per-row areas as (earth circumference slice) * cos-corrected
    height; here: A = (pi/180 * R * d)^2 * cos(lat)."""
    k = math.pi / 180.0 * r_earth_km * cell_deg
    return F.lit(k * k) * F.cos(F.radians(lat))


def ocean_volume(
    cells: DataFrame,
    lat_col: str = "lat",
    z_col: str = "z",
    cell_deg: float = 0.1,
) -> DataFrame:
    """Ocean surface area + volume: mask z<0, integrate lat-weighted cell
    areas (ExtractData.java:125-135, 322-340). Volume in km^3 (z in meters)."""
    area = cell_area_km2(F.col(lat_col), cell_deg)
    sea = cells.filter(F.col(z_col) < 0)
    return sea.agg(
        F.round(F.sum(area), 3).alias("area_km2"),
        F.round(F.sum(area * (-F.col(z_col)) / 1000.0), 3).alias("volume_km3"),
        F.count("*").alias("n_sea_cells"),
    )


# ---------------------------------------------------------------------------
# A10/A11/A12: palette mapping, map projection, shaded-relief RGB — the
# reference's imaging demo tier as pure column expressions.
# ---------------------------------------------------------------------------

# ETOPO1-style elevation palette: piecewise-linear RGB records
# (imaging/palette/ColorPaletteRecordRGB.java:96-121 interpolation semantics)
PALETTE_ETOPO = [
    (-11000.0, -4000.0, (16, 16, 80), (30, 70, 140)),
    (-4000.0, 0.0, (30, 70, 140), (180, 220, 250)),
    (0.0, 1000.0, (60, 140, 60), (200, 190, 120)),
    (1000.0, 4000.0, (200, 190, 120), (150, 90, 60)),
    (4000.0, 9000.0, (150, 90, 60), (255, 255, 255)),
]


def argb_expr(z, records=PALETTE_ETOPO, shade=None):
    """ARGB from the matching palette record: t = clamp((z-z0)/(z1-z0)),
    channel = (int)(delta*t + c0 + 0.5) — with a shade multiplier the
    reference applies it INSIDE the rounding (getArgbWithShade:110-121).
    Returns a BIGINT (0xff000000 | r<<16 | g<<8 | b, unsigned form)."""
    out = None
    last = len(records) - 1
    for i, (z0, z1, (r0, g0, b0), (r1, g1, b1)) in enumerate(records):
        if z1 == z0:
            t = F.lit(0.0)  # categorical single-value record
        else:
            t = (z - F.lit(z0)) / F.lit(z1 - z0)
            t = F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
        chans = []
        for c0, c1 in ((r0, r1), (g0, g1), (b0, b1)):
            v = F.lit(float(c1 - c0)) * t + F.lit(float(c0))
            if shade is not None:
                v = shade * v
            chans.append(F.floor(v + F.lit(0.5)).cast("long"))
        argb = F.lit(0xFF000000) + chans[0] * 65536 + chans[1] * 256 + chans[2]
        # categorical records match their single value; the LAST record is
        # the termination record and covers z == range1
        # (ColorPaletteRecord.isCovered / termination semantics)
        if z1 == z0:
            cond = z == F.lit(z0)
        elif i == last:
            cond = (z >= F.lit(z0)) & (z <= F.lit(z1))
        else:
            cond = (z >= F.lit(z0)) & (z < F.lit(z1))
        out = F.when(cond, argb) if out is None else out.when(cond, argb)
    return out


def argb_sql(z: str, records=PALETTE_ETOPO, shade: str | None = None) -> str:
    """DuckDB twin of argb_expr (identical clamp/round arithmetic)."""
    whens = []
    last = len(records) - 1
    for i, (z0, z1, (r0, g0, b0), (r1, g1, b1)) in enumerate(records):
        if z1 == z0:
            t = "0.0"
        else:
            t = f"least(greatest((({z}) - {z0!r}) / {z1 - z0!r}, 0.0), 1.0)"
        chans = []
        for c0, c1 in ((r0, r1), (g0, g1), (b0, b1)):
            v = f"({float(c1 - c0)!r} * {t} + {float(c0)!r})"
            if shade is not None:
                v = f"(({shade}) * {v})"
            chans.append(f"CAST(floor({v} + 0.5) AS BIGINT)")
        argb = f"(4278190080 + {chans[0]} * 65536 + {chans[1]} * 256 + {chans[2]})"
        if z1 == z0:
            cond = f"({z}) = {z0!r}"
        elif i == last:
            cond = f"({z}) >= {z0!r} AND ({z}) <= {z1!r}"
        else:
            cond = f"({z}) >= {z0!r} AND ({z}) < {z1!r}"
        whens.append(f"WHEN {cond} THEN {argb}")
    return "CASE " + " ".join(whens) + " END"


R_EARTH_KM = 6371.0072


def mercator_cols(lat, lon):
    """A11 demo projection: spherical Mercator x = R*lon_rad,
    y = R*ln(tan(pi/4 + lat_rad/2))."""
    x = F.radians(lon) * F.lit(R_EARTH_KM)
    y = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / 2)) * F.lit(R_EARTH_KM)
    return x, y


def mercator_sql(lat: str, lon: str) -> tuple[str, str]:
    x = f"radians({lon}) * {R_EARTH_KM!r}"
    y = f"ln(tan(pi() / 4.0 + radians({lat}) / 2)) * {R_EARTH_KM!r}"
    return x, y


# --- A11 true form: Albers equal-area conic -----------------------------------
#
# The reference demo's named projection
# (demo/geoTiff/AlbersEqualAreaConic.java:44-196; instantiated by
# LandCoverTints.java:116 as (23, -96, 29.5, 45.5) — the CONUS/NLCD frame).
# Ellipsoidal WGS84 forward with the same Snyder equations (q: 3-12,
# m: 14-15, rho/theta: 14-1..14-4); constants are computed driver-side and
# folded into the column expressions, so the executor math is pure
# closed-form trig (whole-stage codegen, no UDF).
#
# The reference ships forward only; the INVERSE here uses Snyder's
# closed-form authalic-latitude series (eq 3-18) instead of the iterative
# latitude solve — iteration as a Catalyst expression would duplicate the
# sub-tree once per round (codegen blowup); the series is a 3-term
# closed form with ~1e-10 rad accuracy, well under the round(_,6) grain.

_ALBERS_A = 6378137.0            # semiMajorAxis (WGS84)
_ALBERS_E = 8.1819190842622e-2   # eccentricity


def _albers_q_py(sinphi: float, e: float) -> float:
    e2 = e * e
    return (1 - e2) * (
        sinphi / (1 - e2 * sinphi * sinphi)
        - (1 / (2 * e)) * math.log((1 - e * sinphi) / (1 + e * sinphi))
    )


def albers_setup(
    lat0: float = 23.0, lon0: float = -96.0, sp1: float = 29.5, sp2: float = 45.5
) -> dict:
    """Driver-side projection constants (ctor body of the reference class).
    Parallels are ordered by |value| like the reference ctor."""
    if abs(sp1) > abs(sp2):
        sp1, sp2 = sp2, sp1
    e, a = _ALBERS_E, _ALBERS_A
    e2 = e * e
    phi0, phi1, phi2 = map(math.radians, (lat0, sp1, sp2))
    q0 = _albers_q_py(math.sin(phi0), e)
    q1 = _albers_q_py(math.sin(phi1), e)
    q2 = _albers_q_py(math.sin(phi2), e)
    m1 = math.cos(phi1) / math.sqrt(1 - e2 * math.sin(phi1) ** 2)
    m2 = math.cos(phi2) / math.sqrt(1 - e2 * math.sin(phi2) ** 2)
    nu = (m1 * m1 - m2 * m2) / (q2 - q1)
    ca = m1 * m1 + nu * q1
    rho0 = math.sqrt(ca - nu * q0) / nu
    # authalic-latitude series constants (Snyder eq 3-18) for the inverse
    qp = _albers_q_py(1.0, e)  # q at the pole
    e4, e6 = e2 * e2, e2 * e2 * e2
    c2 = e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0
    c4 = 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0
    c6 = 761.0 * e6 / 45360.0
    return dict(a=a, e=e, e2=e2, lon0=lon0, nu=nu, ca=ca, rho0=rho0,
                qp=qp, c2=c2, c4=c4, c6=c6)


def albers_cols(lat, lon, p: dict | None = None):
    """Forward Albers: (lat, lon) degrees -> (x, y) meters, column math
    identical to the reference forward() (including the +-180 central-
    meridian wrap and the |lat|<=90 clamp)."""
    if p is None:
        p = albers_setup()
    e, e2, nu, ca, rho0, a = p["e"], p["e2"], p["nu"], p["ca"], p["rho0"], p["a"]
    latc = F.greatest(F.lit(-90.0), F.least(F.lit(90.0), lat))
    delta = lon - F.lit(p["lon0"])
    delta = F.when(delta < -180.0, delta + 360.0).when(delta >= 180.0, delta - 360.0).otherwise(delta)
    sinphi = F.sin(F.radians(latc))
    q = F.lit(1 - e2) * (
        sinphi / (F.lit(1.0) - F.lit(e2) * sinphi * sinphi)
        - F.lit(1 / (2 * e)) * F.log((F.lit(1.0) - F.lit(e) * sinphi) / (F.lit(1.0) + F.lit(e) * sinphi))
    )
    theta = F.lit(nu) * F.radians(delta)
    rho = F.sqrt(F.lit(ca) - F.lit(nu) * q) / F.lit(nu)
    x = F.lit(a) * rho * F.sin(theta)
    y = F.lit(a) * (F.lit(rho0) - rho * F.cos(theta))
    return x, y


def albers_sql(lat: str, lon: str, p: dict | None = None) -> tuple[str, str]:
    """DuckDB twin of albers_cols (identical arithmetic, text form)."""
    if p is None:
        p = albers_setup()
    e, e2, nu, ca, rho0, a = p["e"], p["e2"], p["nu"], p["ca"], p["rho0"], p["a"]
    latc = f"greatest(-90.0, least(90.0, {lat}))"
    d0 = f"(({lon}) - ({p['lon0']!r}))"
    delta = (
        f"(CASE WHEN {d0} < -180.0 THEN {d0} + 360.0 "
        f"WHEN {d0} >= 180.0 THEN {d0} - 360.0 ELSE {d0} END)"
    )
    s = f"sin(radians({latc}))"
    q = (
        f"({(1 - e2)!r} * ({s} / (1.0 - {e2!r} * {s} * {s})"
        f" - {(1 / (2 * e))!r} * ln((1.0 - {e!r} * {s}) / (1.0 + {e!r} * {s}))))"
    )
    theta = f"({nu!r} * radians({delta}))"
    rho = f"(sqrt({ca!r} - {nu!r} * {q}) / {nu!r})"
    x = f"({a!r} * {rho} * sin({theta}))"
    y = f"({a!r} * ({rho0!r} - {rho} * cos({theta})))"
    return x, y


def albers_inv_cols(x, y, p: dict | None = None):
    """Inverse Albers: (x, y) meters -> (lat, lon) degrees. rho/theta from
    Snyder 14-10/14-11, latitude via the authalic series (3-18)."""
    if p is None:
        p = albers_setup()
    a, nu, ca, rho0 = p["a"], p["nu"], p["ca"], p["rho0"]
    sgn = 1.0 if nu >= 0 else -1.0
    xn, yn = x / F.lit(a), y / F.lit(a)
    rr = F.lit(rho0) - yn
    rho = F.sqrt(xn * xn + rr * rr)
    theta = F.atan2(F.lit(sgn) * xn, F.lit(sgn) * rr)
    q = (F.lit(ca) - rho * rho * F.lit(nu * nu)) / F.lit(nu)
    beta = F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), q / F.lit(p["qp"]))))
    phi = (
        beta
        + F.lit(p["c2"]) * F.sin(2.0 * beta)
        + F.lit(p["c4"]) * F.sin(4.0 * beta)
        + F.lit(p["c6"]) * F.sin(6.0 * beta)
    )
    lat = F.degrees(phi)
    lon = F.lit(p["lon0"]) + F.degrees(theta / F.lit(nu))
    lon = F.when(lon < -180.0, lon + 360.0).when(lon >= 180.0, lon - 360.0).otherwise(lon)
    return lat, lon


# --- A12 true form: YCoCg-R reversible color transform ------------------------
#
# The reference's imaging experiment stores photographic tiles as three
# GVRS int elements in the YCoCg-R space because the lifted integer
# transform is exactly reversible and decorrelates the channels ahead of
# the predictor codecs (demo/imaging/ExperimentalImageStorage.java:225-295).
# Java's `>> 1` is an arithmetic shift = floor division by 2, expressed
# here as floor(x/2) so the Spark and DuckDB forms are identical.


def _fd2(c):
    return F.floor(c / 2).cast("int")


def ycocg_from_argb(argb):
    """ARGB int column -> (y, co, cg) int columns (lossless forward)."""
    r = F.shiftright(argb, 16).bitwiseAND(F.lit(255))
    g = F.shiftright(argb, 8).bitwiseAND(F.lit(255))
    b = argb.bitwiseAND(F.lit(255))
    co = (r - b).cast("int")
    tmp = (b + _fd2(co)).cast("int")
    cg = (g - tmp).cast("int")
    y = (tmp + _fd2(cg)).cast("int")
    return y, co, cg


def rgb_from_ycocg(y, co, cg):
    """(y, co, cg) -> (r, g, b) int columns (exact inverse)."""
    tmp = (y - _fd2(cg)).cast("int")
    g = (cg + tmp).cast("int")
    b = (tmp - _fd2(co)).cast("int")
    r = (b + co).cast("int")
    return r, g, b


def ycocg_sql(argb: str) -> tuple[str, str, str]:
    """DuckDB twin of ycocg_from_argb (same floor-division shifts)."""
    r = f"((({argb}) // 65536) % 256)"
    g = f"((({argb}) // 256) % 256)"
    b = f"(({argb}) % 256)"
    co = f"({r} - {b})"
    tmp = f"({b} + CAST(floor({co} / 2.0) AS INTEGER))"
    cg = f"({g} - {tmp})"
    y = f"({tmp} + CAST(floor({cg} / 2.0) AS INTEGER))"
    return y, co, cg


def rgb_from_ycocg_sql(y: str, co: str, cg: str) -> tuple[str, str, str]:
    tmp = f"(({y}) - CAST(floor(({cg}) / 2.0) AS INTEGER))"
    g = f"(({cg}) + {tmp})"
    b = f"({tmp} - CAST(floor(({co}) / 2.0) AS INTEGER))"
    r = f"({b} + ({co}))"
    return r, g, b


def albers_inv_sql(x: str, y: str, p: dict | None = None) -> tuple[str, str]:
    if p is None:
        p = albers_setup()
    a, nu, ca, rho0 = p["a"], p["nu"], p["ca"], p["rho0"]
    sgn = 1.0 if nu >= 0 else -1.0
    xn, yn = f"(({x}) / {a!r})", f"(({y}) / {a!r})"
    rr = f"({rho0!r} - {yn})"
    rho = f"sqrt({xn} * {xn} + {rr} * {rr})"
    theta = f"atan2({sgn!r} * {xn}, {sgn!r} * {rr})"
    q = f"(({ca!r} - {rho} * {rho} * {(nu * nu)!r}) / {nu!r})"
    beta = f"asin(greatest(-1.0, least(1.0, {q} / {p['qp']!r})))"
    phi = (
        f"({beta} + {p['c2']!r} * sin(2.0 * {beta})"
        f" + {p['c4']!r} * sin(4.0 * {beta})"
        f" + {p['c6']!r} * sin(6.0 * {beta}))"
    )
    lat = f"degrees({phi})"
    lon0 = f"({p['lon0']!r} + degrees({theta} / {nu!r}))"
    lon = (
        f"(CASE WHEN {lon0} < -180.0 THEN {lon0} + 360.0 "
        f"WHEN {lon0} >= 180.0 THEN {lon0} - 360.0 ELSE {lon0} END)"
    )
    return lat, lon


def read_cpt(text: str) -> dict:
    """Parse a GMT-style .cpt color palette
    (imaging/palette/ColorPaletteTableReader.java:155-430, RGB model):
    records `z0 r g b z1 r g b` (slash-separated colors also accepted),
    optional `;Label` suffixes, single-value categorical records, and
    B/F/N background/foreground/null colors. Returns
    {records: [(z0, z1, rgb0, rgb1)], labels: [...], background, foreground,
    null_color, range_min, range_max} — records feed argb_expr/argb_sql
    directly."""
    import re

    records, labels = [], []
    model = "RGB"
    bfn = {"B": None, "F": None, "N": None}
    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        if s.startswith("#"):
            m = re.search(r"COLOR_MODEL\s*=\s*(\w+)", s)
            if m:
                model = m.group(1).upper()
                if model not in ("RGB", "HSV"):
                    raise ValueError(f"unsupported color model {model}")
            continue
        label = None
        if ";" in s:
            s, label = s.split(";", 1)
            label = label.strip()
            s = s.strip()
        if s and s[0] in "BFN" and (len(s) == 1 or s[1].isspace() or s[1] == "\t"):
            a = re.split(r"[\s/]+", s.strip())
            bfn[a[0]] = (int(a[1]), int(a[2]), int(a[3]))
            continue
        a = re.split(r"[\s/]+", s)
        # HSV model: hue in degrees, s/v in [0,1] — floats, not ints
        # (ColorPaletteTableReader.java:282-434 + ColorPaletteRecordHSV).
        # Dash triples h-s-v (parseSingleHsvString) appear only as the
        # COLOR fields of the 2- and 4-token forms (a[1] / a[1], a[3]) —
        # never split the z-value tokens, which may be negative
        # (bathymetry) or in scientific notation
        if model == "HSV" and len(a) in (2, 4):
            out_toks = []
            for i, tok in enumerate(a):
                if i % 2 == 1 and "-" in tok:
                    out_toks.extend(tok.split("-"))
                else:
                    out_toks.append(tok)
            a = out_toks
        conv = float if model == "HSV" else int
        if len(a) == 8:
            z0, z1 = float(a[0]), float(a[4])
            rgb0 = (conv(a[1]), conv(a[2]), conv(a[3]))
            rgb1 = (conv(a[5]), conv(a[6]), conv(a[7]))
        elif len(a) == 4:  # categorical: one value, one color
            z0 = float(a[0])
            z1 = float(a[0])
            rgb0 = rgb1 = (conv(a[1]), conv(a[2]), conv(a[3]))
        else:
            raise ValueError(f"unparseable palette line: {line!r}")
        records.append((z0, z1, rgb0, rgb1))
        labels.append(label)
    if not records:
        raise ValueError("palette has no records")
    records_sorted = sorted(zip(records, labels), key=lambda rl: (rl[0][0], rl[0][1]))
    records = [r for r, _ in records_sorted]
    labels = [l for _, l in records_sorted]
    return {
        "records": records,
        "labels": labels,
        "model": model,
        "background": bfn["B"],
        "foreground": bfn["F"],
        "null_color": bfn["N"],
        "range_min": min(r[0] for r in records),
        "range_max": max(r[1] for r in records),
    }


def _hsv_record_params(z0, z1, hsv0, hsv1):
    """Precomputed interpolation parameters, ColorPaletteRecordHSV ctor
    (:95-131): shortest angular hue path, the dH==0-after-wrap -> 360 quirk
    included, and the wrapAround flag that folds hue back into [0, 360]."""
    h0, s0, v0 = hsv0
    h1, s1, v1 = hsv1
    d_h = h1 - h0
    if abs(d_h) < 1.0e-6:
        delta_h = 0.0
    else:
        if d_h <= -180:
            d_h += 360
        elif d_h > 180:
            d_h -= 360
        if d_h == 0:
            d_h = 360
        delta_h = d_h
    wrap = (h0 + delta_h > 360.0) or (h0 + delta_h < 0)
    return h0, s0, v0, delta_h, s1 - s0, v1 - v0, wrap


def argb_hsv_expr(z, records):
    """A10, HSV color model: per-record hue/sat/val interpolation with
    shortest-path hue wrap (ColorPaletteRecordHSV.getArgb:146-175), then
    HSB->RGB via the closed form chan(n) = v*(1 - s*clamp(min(k, 4-k), 0, 1)),
    k = (n + h*6) mod 6 (n = 5/3/1 for r/g/b) — algebraically identical to
    java.awt.Color.HSBtoRGB's sector switch (each sector's p/q/t expression
    falls out of the clamp), but one small expression tree per channel
    instead of an 18-branch CASE that blows whole-stage codegen's 64KB
    method limit. The s==0 grey case needs no branch: the multiplier is 0.
    records: (z0, z1, (h0,s0,v0), (h1,s1,v1)) with hue in degrees."""
    out = None
    last = len(records) - 1
    for i, (z0, z1, hsv0, hsv1) in enumerate(records):
        h0, s0, v0, d_h, d_s, d_v, wrap = _hsv_record_params(z0, z1, hsv0, hsv1)
        if z1 == z0:
            t = F.lit(0.0)
        else:
            t = (z - F.lit(z0)) / F.lit(z1 - z0)
            t = F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
        a = F.lit(d_h) * t + F.lit(h0)
        if wrap:
            a = F.when(a < 0.0, a + 360.0).when(a > 360.0, a - 360.0).otherwise(a)
        s = F.lit(d_s) * t + F.lit(s0)
        v = F.lit(d_v) * t + F.lit(v0)
        hue = a / F.lit(360.0)
        h6 = (hue - F.floor(hue)) * F.lit(6.0)

        def chan(n):
            k = (F.lit(float(n)) + h6) % F.lit(6.0)
            m = F.greatest(F.lit(0.0), F.least(k, F.lit(4.0) - k, F.lit(1.0)))
            x = v * (F.lit(1.0) - s * m)
            return F.floor(x * F.lit(255.0) + F.lit(0.5)).cast("long")

        argb = F.lit(0xFF000000) + chan(5) * 65536 + chan(3) * 256 + chan(1)
        if z1 == z0:
            cond = z == F.lit(z0)
        elif i == last:
            cond = (z >= F.lit(z0)) & (z <= F.lit(z1))
        else:
            cond = (z >= F.lit(z0)) & (z < F.lit(z1))
        out = F.when(cond, argb) if out is None else out.when(cond, argb)
    return out


def argb_hsv_sql(z: str, records) -> str:
    """DuckDB twin of argb_hsv_expr — identical closed-form arithmetic."""
    whens = []
    last = len(records) - 1
    for i, (z0, z1, hsv0, hsv1) in enumerate(records):
        h0, s0, v0, d_h, d_s, d_v, wrap = _hsv_record_params(z0, z1, hsv0, hsv1)
        if z1 == z0:
            t = "0.0"
        else:
            t = f"least(greatest((({z}) - {z0!r}) / {z1 - z0!r}, 0.0), 1.0)"
        a = f"({d_h!r} * {t} + {h0!r})"
        if wrap:
            a = f"(CASE WHEN {a} < 0.0 THEN {a} + 360.0 WHEN {a} > 360.0 THEN {a} - 360.0 ELSE {a} END)"
        s = f"({d_s!r} * {t} + {s0!r})"
        v = f"({d_v!r} * {t} + {v0!r})"
        hue = f"({a} / 360.0)"
        h6 = f"(({hue} - floor({hue})) * 6.0)"

        def chan(n):
            k = f"fmod({float(n)!r} + {h6}, 6.0)"
            m = f"greatest(0.0, least({k}, 4.0 - {k}, 1.0))"
            x = f"({v} * (1.0 - {s} * {m}))"
            return f"CAST(floor({x} * 255.0 + 0.5) AS BIGINT)"

        argb = f"(4278190080 + {chan(5)} * 65536 + {chan(3)} * 256 + {chan(1)})"
        if z1 == z0:
            cond = f"({z}) = {z0!r}"
        elif i == last:
            cond = f"({z}) >= {z0!r} AND ({z}) <= {z1!r}"
        else:
            cond = f"({z}) >= {z0!r} AND ({z}) < {z1!r}"
        whens.append(f"WHEN {cond} THEN {argb}")
    return "CASE " + " ".join(whens) + " END"


# --- sRGB <-> linear intensity (imaging/util/LinearRgb.java) -----------------

def srgb_to_linear(channel):
    """Standard sRGB component (0..255) -> linear intensity (0..1), the
    exact power-function form (LinearRgb.computeLinear:193-200: s/12.92
    below the 0.04045 transition, else ((s+0.055)/1.055)^2.4). Pure JVM
    column expression — the shading/compositing primitive the reference's
    imaging utilities build on."""
    s = channel.cast("double") / F.lit(255.0)
    return F.when(s <= 0.04045, s / 12.92).otherwise(
        F.pow((s + F.lit(0.055)) / F.lit(1.055), F.lit(2.4))
    )


def linear_to_srgb(linear):
    """Linear intensity (0..1) -> sRGB component (0..255), the exact
    inverse (LinearRgb.computeStandard: 12.92*v below 0.04045/12.92, else
    1.055*v^(1/2.4) - 0.055), rounded to the integer level like the
    reference's lookup-table output."""
    v = linear.cast("double")
    s = F.when(v <= F.lit(0.04045 / 12.92), v * 12.92).otherwise(
        F.lit(1.055) * F.pow(v, F.lit(1.0 / 2.4)) - F.lit(0.055)
    )
    return F.floor(s * 255.0 + 0.5).cast("long")
