"""gridfour_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses what gwlucastrig/gridfour (GVRS virtual rasters) *computes* —
tiled 2-D grids, exact tile-assignment arithmetic, geographic/Cartesian
coordinate transforms with fringe rounding, B-spline raster->vector sampling,
predictor-based lossless tile compression — as distributed DataFrame / Arrow
operations, plus the spatial-join (cell index, point-in-polygon, kNN) and
training-data operators (dedup, similarity search, text analysis) a 100 TB
pipeline needs.

This is NOT a port: the reference is a single-process Java library; here the
logical plan is declared with pyspark.sql and Catalyst/Tungsten pick the
physical strategy. Python touches data only through Arrow-batched pandas UDFs
(never per-row Python), and only where built-in column expressions genuinely
cannot express the semantics (B-spline stencil einsum, compression kernels,
polygon containment).

Reference citations in docstrings use file:line into /root/reference/.
"""

from gridfour_spark.spec import GridSpec
from gridfour_spark.session import get_spark

__all__ = ["GridSpec", "get_spark"]
__version__ = "0.1.0"
