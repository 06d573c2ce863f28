"""Minimal ESRI Shapefile codec [SURVEY.md §2.1 -i/-o shp; public spec:
the ESRI Shapefile Technical Description whitepaper].

Scope: Point (type 1) and Polygon (type 5) .shp geometry records —
enough to roundtrip the engine's point and multi-ring layers. Attribute
.dbf and index .shx sidecars are out of scope (ids are implicit record
order; attributes live in parquet-land anyway). Pure ``struct`` packing,
dependency-free; Spark-side the decoded records become the engine's
standard point / ring tables.
"""

from __future__ import annotations

import struct

SHP_POINT = 1
SHP_POLYGON = 5


def _bbox(points):
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    return min(xs), min(ys), max(xs), max(ys)


def write_points_shp(path: str, points: list[tuple[float, float]]) -> None:
    """points: [(x, y), ...] in record order."""
    records = b""
    for i, (x, y) in enumerate(points):
        content = struct.pack("<idd", SHP_POINT, x, y)
        records += struct.pack(">ii", i + 1, len(content) // 2) + content
    _write_shp(path, SHP_POINT, records, _bbox(points))


def write_polygons_shp(path: str, features: list[list[list[tuple[float, float]]]]) -> None:
    """features: one entry per feature, each a list of rings (open —
    the writer appends the spec's closing vertex per ring)."""
    records = b""
    allpts = [p for f in features for r in f for p in r]
    for i, rings in enumerate(features):
        closed = [list(r) + [r[0]] for r in rings]
        pts = [p for r in closed for p in r]
        x0, y0, x1, y1 = _bbox(pts)
        parts = []
        off = 0
        for r in closed:
            parts.append(off)
            off += len(r)
        content = struct.pack("<i4d", SHP_POLYGON, x0, y0, x1, y1)
        content += struct.pack("<ii", len(closed), len(pts))
        content += b"".join(struct.pack("<i", p) for p in parts)
        content += b"".join(struct.pack("<dd", x, y) for x, y in pts)
        records += struct.pack(">ii", i + 1, len(content) // 2) + content
    _write_shp(path, SHP_POLYGON, records, _bbox(allpts))


def _write_shp(path: str, shp_type: int, records: bytes, bbox) -> None:
    x0, y0, x1, y1 = bbox
    total_16bit_words = (100 + len(records)) // 2
    header = struct.pack(
        ">i5ii", 9994, 0, 0, 0, 0, 0, total_16bit_words
    ) + struct.pack("<ii8d", 1000, shp_type, x0, y0, x1, y1, 0.0, 0.0, 0.0, 0.0)
    with open(path, "wb") as f:
        f.write(header + records)


def read_shp(path: str):
    """Parse a .shp file → (shp_type, records). Point records are
    (x, y); Polygon records are lists of CLOSED rings [(x, y), ...]."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, = struct.unpack(">i", buf[:4])
    if magic != 9994:
        raise ValueError("not a shapefile (bad magic)")
    shp_type, = struct.unpack("<i", buf[32:36])
    out = []
    off = 100
    while off < len(buf):
        _recno, length_words = struct.unpack(">ii", buf[off : off + 8])
        off += 8
        content = buf[off : off + length_words * 2]
        off += length_words * 2
        rtype, = struct.unpack("<i", content[:4])
        if rtype == SHP_POINT:
            x, y = struct.unpack("<dd", content[4:20])
            out.append((x, y))
        elif rtype == SHP_POLYGON:
            n_parts, n_points = struct.unpack("<ii", content[36:44])
            parts = list(
                struct.unpack(f"<{n_parts}i", content[44 : 44 + 4 * n_parts])
            )
            pts_off = 44 + 4 * n_parts
            pts = [
                struct.unpack("<dd", content[pts_off + 16 * i : pts_off + 16 * i + 16])
                for i in range(n_points)
            ]
            bounds = parts + [n_points]
            out.append([pts[bounds[k] : bounds[k + 1]] for k in range(n_parts)])
        else:
            raise NotImplementedError(f"shp record type {rtype}")
    return shp_type, out


def import_polygons_shp(spark, path: str):
    """.shp polygons → the engine's multi-ring table (poly_id, ring_idx,
    xs, ys) — closing vertices dropped (engine rings are open)."""
    import pandas as pd

    shp_type, recs = read_shp(path)
    if shp_type != SHP_POLYGON:
        raise ValueError("not a polygon shapefile")
    rows = []
    for pid, rings in enumerate(recs):
        for ri, ring in enumerate(rings):
            open_ring = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else ring
            rows.append(
                {
                    "poly_id": pid,
                    "ring_idx": ri,
                    "xs": [p[0] for p in open_ring],
                    "ys": [p[1] for p in open_ring],
                }
            )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["poly_id", "ring_idx", "xs", "ys"]),
        schema="poly_id int, ring_idx int, xs array<double>, ys array<double>",
    )


def import_points_shp(spark, path: str):
    """.shp points → (point_id, lon, lat)."""
    import pandas as pd

    shp_type, recs = read_shp(path)
    if shp_type != SHP_POINT:
        raise ValueError("not a point shapefile")
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": range(len(recs)),
                "lon": [p[0] for p in recs],
                "lat": [p[1] for p in recs],
            }
        ),
        schema="point_id long, lon double, lat double",
    )
