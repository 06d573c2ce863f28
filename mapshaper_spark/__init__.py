"""mapshaper_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of
mapshaper (reference: jarben/mapshaper — see SURVEY.md; the checkout at
/root/reference was empty at survey time, so parity targets come from
SURVEY.md §2 and BASELINE.json's north rule), re-expressed Spark-first:

- geometry lives in columnar DataFrames (arc dictionary, exploded vertices);
- cell indexing (quadkey/Morton Z-order, H3/S2-style) is pure column math;
- geometry kernels (PIP, clip, Visvalingam, Douglas-Peucker, shoelace,
  scanline rasterize) are vectorized numpy inside Arrow pandas UDFs;
- joins/aggregations/windows are stock Catalyst plans (broadcast hints,
  salted skew joins, repartitionByRange on cell_id).

No RDDs, no per-row Python anywhere.
"""

__version__ = "0.1.0"
