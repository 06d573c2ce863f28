"""SVG export [SURVEY.md §2.1 -o format=svg; upstream mapshaper's
default presentation output].

Spark-idiomatic split of the work: the expensive part — one ``d``
path string per feature over every ring vertex — is pure JVM column
math (``transform`` + ``format_string`` + ``concat_ws`` inside the
projection, no UDFs), so it scans with full parallelism at any layer
size. The single-document export collects one small string per
FEATURE (not per vertex) — same scale posture as
``geojson.topojson_doc`` — and :func:`svg_tiled_documents` is the
scan-scale form: per-tile documents assembled in a grouped Arrow
stage, nothing on the driver, the way ``export_topojson_tiled``
shards the Topology export.

Geometry model in, presentation out: rings arrive as the engine's
(poly_id, ring_idx, xs, ys) table; each feature becomes one
``<path fill-rule="evenodd">`` whose subpaths are its rings in
ring_idx order (even-odd parity renders holes — the same convention
the kernels use, so no hole tagging is needed). The y axis flips
(SVG grows downward) and coordinates scale so the layer spans
``width`` SVG units, rounded to ``precision`` decimals with JVM
printf — deterministic output for a given layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _layer_frame(features: DataFrame, width: float):
    """Bounds + the lonlat→SVG affine (scale k, origin, height)."""
    b = features.select(
        F.min(F.expr("array_min(xs)")).alias("x0"),
        F.max(F.expr("array_max(xs)")).alias("x1"),
        F.min(F.expr("array_min(ys)")).alias("y0"),
        F.max(F.expr("array_max(ys)")).alias("y1"),
    ).first()
    if b.x0 is None:
        return 0.0, 0.0, 1.0, float(width), float(width)
    k = float(width) / max(b.x1 - b.x0, 1e-12)
    height = max(b.y1 - b.y0, 1e-12) * k
    return float(b.x0), float(b.y1), k, float(width), height


def svg_path_features(
    features: DataFrame, width: float = 800.0, precision: int = 2
) -> tuple[DataFrame, float, float]:
    """(poly_id, ring_idx, xs, ys) rings → one (poly_id, d) row per
    feature plus the document (width, height). The per-vertex work is a
    single distributed projection."""
    x0, y1, k, w, h = _layer_frame(features, width)
    fmt = f"%.{precision}f"
    pt = lambda p: F.format_string(  # noqa: E731 — HOF lambda helper
        f"{fmt},{fmt}",
        (p["xs"] - F.lit(x0)) * F.lit(k),
        (F.lit(y1) - p["ys"]) * F.lit(k),
    )
    sub = F.concat(
        F.lit("M"),
        F.concat_ws(" L", F.transform(F.arrays_zip("xs", "ys"), pt)),
        F.lit("Z"),
    )
    paths = (
        features.select("poly_id", "ring_idx", sub.alias("sub"))
        .groupBy("poly_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ring_idx", "sub"))),
                    lambda s: s["sub"],
                ),
            ).alias("d")
        )
    )
    return paths, w, h


def svg_document(
    features: DataFrame, width: float = 800.0, precision: int = 2
) -> str:
    """-o format=svg: one document for the layer. Collects one path
    string per feature (document assembly is inherently single-file —
    the vertex-scale work already ran distributed)."""
    paths, w, h = svg_path_features(features, width, precision)
    rows = paths.orderBy("poly_id").collect()
    body = "\n".join(
        f'<path id="f{r["poly_id"]}" d="{r["d"]}" fill-rule="evenodd"/>'
        for r in rows
    )
    return (
        '<svg xmlns="http://www.w3.org/2000/svg" version="1.2" '
        f'baseProfile="tiny" width="{w:g}" height="{h:g}" '
        f'viewBox="0 0 {w:g} {h:g}">\n{body}\n</svg>'
    )


def svg_point_document(
    points: DataFrame,
    width: float = 800.0,
    precision: int = 2,
    r: float = 2.0,
    id_col: str = "point_id",
    x_col: str = "lon",
    y_col: str = "lat",
) -> str:
    """Point layer → one <circle> per point. Same frame/flip rules as
    the polygon export; circle markup builds JVM-side."""
    rings = points.select(
        F.col(id_col).alias("poly_id"),
        F.lit(0).alias("ring_idx"),
        F.array(F.col(x_col)).alias("xs"),
        F.array(F.col(y_col)).alias("ys"),
    )
    x0, y1, k, w, h = _layer_frame(rings, width)
    fmt = f"%.{precision}f"
    circle = F.format_string(
        f'<circle id="p%s" cx="{fmt}" cy="{fmt}" r="{r:g}"/>',
        F.col(id_col).cast("string"),
        (F.col(x_col) - F.lit(x0)) * F.lit(k),
        (F.lit(y1) - F.col(y_col)) * F.lit(k),
    )
    rows = points.select(F.col(id_col), circle.alias("c")).orderBy(id_col).collect()
    body = "\n".join(r2["c"] for r2 in rows)
    return (
        '<svg xmlns="http://www.w3.org/2000/svg" version="1.2" '
        f'baseProfile="tiny" width="{w:g}" height="{h:g}" '
        f'viewBox="0 0 {w:g} {h:g}">\n{body}\n</svg>'
    )


def svg_tiled_documents(
    features: DataFrame,
    nx: int = 2,
    ny: int = 2,
    width: float = 800.0,
    precision: int = 2,
) -> DataFrame:
    """-o format=svg at SCAN scale: the layer splits into an nx x ny
    grid of SELF-CONTAINED SVG documents sharing ONE global affine —
    each tile's viewBox is its sub-rectangle of the global frame, so
    tiles render side by side seamlessly. Features land on the tile of
    their bbox center (one whole feature per tile — SVG is a
    presentation format; features are not clipped).

    Plan shape: the per-vertex d-string projection and the per-feature
    bbox aggregation run distributed; per-tile document assembly is a
    grouped Arrow stage over the already-built path STRINGS (vertex
    data never reaches it). Returns (tile_x, tile_y, n_features, doc)
    — nothing assembles on the driver."""
    x0, y1, k, w, h = _layer_frame(features, width)
    fb = features.groupBy("poly_id").agg(
        F.min(F.expr("array_min(xs)")).alias("fx0"),
        F.max(F.expr("array_max(xs)")).alias("fx1"),
        F.min(F.expr("array_min(ys)")).alias("fy0"),
        F.max(F.expr("array_max(ys)")).alias("fy1"),
    )
    tw, th = w / nx, h / ny
    assign = fb.select(
        "poly_id",
        F.least(
            F.lit(nx - 1),
            F.floor(((F.col("fx0") + F.col("fx1")) / 2 - F.lit(x0)) * F.lit(k) / F.lit(tw)),
        ).cast("int").alias("tile_x"),
        F.least(
            F.lit(ny - 1),
            F.floor((F.lit(y1) - (F.col("fy0") + F.col("fy1")) / 2) * F.lit(k) / F.lit(th)),
        ).cast("int").alias("tile_y"),
    )
    paths, _, _ = svg_path_features(features, width, precision)
    tagged = paths.join(assign, "poly_id")

    def build(pdf):
        import pandas as pd

        tx, ty = int(pdf["tile_x"].iloc[0]), int(pdf["tile_y"].iloc[0])
        rows = pdf.sort_values("poly_id")
        body = "\n".join(
            f'<path id="f{int(r["poly_id"])}" d="{r["d"]}" fill-rule="evenodd"/>'
            for _, r in rows.iterrows()
        )
        vb = f"{tx * tw:g} {ty * th:g} {tw:g} {th:g}"
        doc = (
            '<svg xmlns="http://www.w3.org/2000/svg" version="1.2" '
            f'baseProfile="tiny" width="{tw:g}" height="{th:g}" '
            f'viewBox="{vb}">\n{body}\n</svg>'
        )
        return pd.DataFrame(
            [{"tile_x": tx, "tile_y": ty, "n_features": len(rows), "doc": doc}]
        )

    return tagged.groupBy("tile_x", "tile_y").applyInPandas(
        build, schema="tile_x int, tile_y int, n_features long, doc string"
    )
