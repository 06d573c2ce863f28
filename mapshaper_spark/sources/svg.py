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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def style_attrs(
    features: DataFrame,
    style: dict[str, str],
    id_col: str = "poly_id",
    where: str | None = None,
) -> DataFrame:
    """``-style`` / ``-svg-style`` [UPSTREAM presentation commands —
    the last declared-out bucket, now covered]: per-feature SVG
    presentation attributes. ``style`` maps attribute names (python
    underscores become hyphens: ``stroke_width`` → ``stroke-width``)
    to Spark SQL expressions over the layer's data columns — string
    literals quote SQL-style (``"'#dddddd'"``), data-driven values are
    arbitrary column math (upstream evaluates a JS expression per
    feature; here the expression compiles into the scan projection).
    ``where`` restricts the styling to matching features (upstream's
    ``where=``) — non-matching features keep an empty attribute string.

    Returns one ``(id_col, attrs)`` row per feature, the attr string
    built entirely JVM-side; at scan scale this is a projection plus
    the same per-feature groupBy the d-string build already pays."""
    pieces: list[Column] = []
    for attr, sql in style.items():
        name = attr.replace("_", "-")
        pieces.append(
            F.concat(
                F.lit(f' {name}="'), F.expr(sql).cast("string"), F.lit('"')
            )
        )
    attrs = F.concat(*pieces) if pieces else F.lit("")
    if where is not None:
        attrs = F.when(F.expr(where), attrs).otherwise(F.lit(""))
    return features.groupBy(id_col).agg(F.first(attrs).alias("attrs"))


def _nice_scale(raw: float) -> float:
    """Largest 1/2/5 x 10^n value <= raw (upstream -scalebar picks its
    round label the same way)."""
    import math

    if raw <= 0:
        return 1.0
    e = math.floor(math.log10(raw))
    for m in (5.0, 2.0, 1.0):
        v = m * 10.0**e
        if v <= raw * (1.0 + 1e-12):
            return v
    return 10.0 ** (e - 1) * 5.0


def scalebar_markup(
    k: float,
    height: float,
    target_px: float = 100.0,
    units: str = "km",
    units_per_data_unit: float = 1.0,
    bar_h: float = 4.0,
    margin: float = 12.0,
) -> str:
    """``-scalebar`` [UPSTREAM]: a bottom-left bar + label group. ``k``
    is the document affine (SVG px per data unit); the bar length is
    the largest nice 1/2/5x10^n label value whose px length fits
    ``target_px``. Pure driver-side string math — annotation markup is
    O(1), nothing distributed to do."""
    px_per_label_unit = k / units_per_data_unit
    nice = _nice_scale(target_px / px_per_label_unit)
    px = nice * px_per_label_unit
    label = f"{nice:g} {units}"
    y = height - margin
    return (
        f'<g id="scalebar"><rect x="{margin:g}" y="{y - bar_h:g}" '
        f'width="{px:g}" height="{bar_h:g}"/>'
        f'<text x="{margin:g}" y="{y - bar_h - 4:g}">{label}</text></g>'
    )


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
    features: DataFrame,
    width: float = 800.0,
    precision: int = 2,
    frame: tuple[float, float, float, float, float] | None = None,
) -> tuple[DataFrame, float, float]:
    """(poly_id, ring_idx, xs, ys) rings → one (poly_id, d) row per
    feature plus the document (width, height). The per-vertex work is a
    single distributed projection. ``frame`` overrides the layer-bounds
    affine with a precomputed (x0, y1, k, w, h) — the ``-frame`` path."""
    x0, y1, k, w, h = frame if frame is not None else _layer_frame(features, width)
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
    features: DataFrame,
    width: float = 800.0,
    precision: int = 2,
    style: dict[str, str] | None = None,
    where: str | None = None,
    frame: tuple[float, float, float, float] | None = None,
    scalebar: dict | None = None,
) -> str:
    """-o format=svg: one document for the layer. Collects one path
    string per feature (document assembly is inherently single-file —
    the vertex-scale work already ran distributed).

    Presentation options [UPSTREAM -style/-frame/-scalebar — the
    declared-presentation bucket]:

    - ``style``/``where``: per-feature SVG attributes via
      :func:`style_attrs` (SQL expressions over the layer's columns,
      compiled into the same distributed projection as the d-strings).
    - ``frame``: a (x0, y0, x1, y1) DATA-coordinate rectangle that
      pins the export affine (instead of the layer bounds) and renders
      as an ``id="frame"`` outline rect — upstream's -frame defines
      the composition extent the same way.
    - ``scalebar``: kwargs for :func:`scalebar_markup` (``{}`` for
      defaults)."""
    if frame is not None:
        fx0, fy0, fx1, fy1 = (float(v) for v in frame)
        k = float(width) / max(fx1 - fx0, 1e-12)
        fr = (fx0, fy1, k, float(width), max(fy1 - fy0, 1e-12) * k)
    else:
        fr = _layer_frame(features, width)
    paths, w, h = svg_path_features(features, width, precision, frame=fr)
    if style:
        paths = paths.join(
            style_attrs(features, style, where=where), "poly_id", "left"
        ).withColumn("attrs", F.coalesce(F.col("attrs"), F.lit("")))
    else:
        paths = paths.withColumn("attrs", F.lit(""))
    rows = paths.orderBy("poly_id").collect()
    body = "\n".join(
        f'<path id="f{r["poly_id"]}" d="{r["d"]}" fill-rule="evenodd"'
        f'{r["attrs"]}/>'
        for r in rows
    )
    extras = []
    if frame is not None:
        extras.append(
            f'<rect id="frame" x="0" y="0" width="{w:g}" height="{h:g}" '
            'fill="none"/>'
        )
    if scalebar is not None:
        extras.append(scalebar_markup(fr[2], h, **scalebar))
    tail = ("\n" + "\n".join(extras)) if extras else ""
    return (
        '<svg xmlns="http://www.w3.org/2000/svg" version="1.2" '
        f'baseProfile="tiny" width="{w:g}" height="{h:g}" '
        f'viewBox="0 0 {w:g} {h:g}">\n{body}{tail}\n</svg>'
    )


def svg_point_document(
    points: DataFrame,
    width: float = 800.0,
    precision: int = 2,
    r: float | str = 2.0,
    id_col: str = "point_id",
    x_col: str = "lon",
    y_col: str = "lat",
    symbol: str = "circle",
    style: dict[str, str] | None = None,
    where: str | None = None,
) -> str:
    """Point layer → one symbol element per point [UPSTREAM -symbols]:
    ``symbol`` picks circle / square / diamond / cross, ``r`` is a
    float literal or a Spark SQL expression over the point's columns
    (upstream sizes symbols from data the same way), and ``style`` /
    ``where`` attach per-point presentation attributes. Same
    frame/flip rules as the polygon export; all markup builds
    JVM-side inside one projection."""
    rings = points.select(
        F.col(id_col).alias("poly_id"),
        F.lit(0).alias("ring_idx"),
        F.array(F.col(x_col)).alias("xs"),
        F.array(F.col(y_col)).alias("ys"),
    )
    x0, y1, k, w, h = _layer_frame(rings, width)
    fmt = f"%.{precision}f"
    cx = (F.col(x_col) - F.lit(x0)) * F.lit(k)
    cy = (F.lit(y1) - F.col(y_col)) * F.lit(k)
    rad = (F.expr(r) if isinstance(r, str) else F.lit(float(r))).cast("double")
    sid = F.col(id_col).cast("string")
    pieces = []
    if style:
        for attr, sql in style.items():
            name = attr.replace("_", "-")
            pieces.append(
                F.concat(
                    F.lit(f' {name}="'),
                    F.expr(sql).cast("string"),
                    F.lit('"'),
                )
            )
    attrs = F.concat(*pieces) if pieces else F.lit("")
    if where is not None:
        attrs = F.when(F.expr(where), attrs).otherwise(F.lit(""))
    if symbol == "circle":
        mark = F.format_string(
            f'<circle id="p%s" cx="{fmt}" cy="{fmt}" r="{fmt}"%s/>',
            sid, cx, cy, rad, attrs,
        )
    elif symbol == "square":
        mark = F.format_string(
            f'<rect id="p%s" x="{fmt}" y="{fmt}" width="{fmt}" '
            f'height="{fmt}"%s/>',
            sid, cx - rad, cy - rad, rad * 2, rad * 2, attrs,
        )
    elif symbol == "diamond":
        mark = F.format_string(
            f'<path id="p%s" d="M{fmt},{fmt} L{fmt},{fmt} L{fmt},{fmt} '
            f'L{fmt},{fmt} Z"%s/>',
            sid, cx, cy - rad, cx + rad, cy, cx, cy + rad, cx - rad, cy,
            attrs,
        )
    elif symbol == "cross":
        mark = F.format_string(
            f'<path id="p%s" d="M{fmt},{fmt} L{fmt},{fmt} M{fmt},{fmt} '
            f'L{fmt},{fmt}"%s/>',
            sid, cx - rad, cy, cx + rad, cy, cx, cy - rad, cx, cy + rad,
            attrs,
        )
    else:
        raise ValueError(f"unknown symbol type: {symbol!r}")
    rows = points.select(F.col(id_col), mark.alias("c")).orderBy(id_col).collect()
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
