"""Minimal ESRI Shapefile codec [SURVEY.md §2.1 -i/-o shp; public spec:
the ESRI Shapefile Technical Description whitepaper + the dBASE III
file structure].

Scope: Point (type 1) and Polygon (type 5) .shp geometry records plus
the sidecars real shapefiles ship with [VERDICT r2 #5 — upstream
src/shapefile/dbf-reader.mjs parity]: the .dbf attribute table
(fixed-width dBASE III records, C/N field types), the .shx offset
index, and a .prj WKT tag. Pure ``struct`` packing, dependency-free;
Spark-side the decoded records become the engine's standard point /
ring tables with attribute columns attached by record order (the
shapefile's implicit join key).
"""

from __future__ import annotations

import struct

SHP_POINT = 1
SHP_POLYLINE = 3
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


def write_polylines_shp(path: str, features: list[list[list[tuple[float, float]]]]) -> None:
    """features: one entry per polyline feature, each a list of parts
    (open vertex chains, >= 2 points — written verbatim; PolyLine has
    no closing-vertex rule)."""
    records = b""
    allpts = [p for f in features for part in f for p in part]
    for i, parts_pts in enumerate(features):
        pts = [p for part in parts_pts for p in part]
        x0, y0, x1, y1 = _bbox(pts)
        parts = []
        off = 0
        for part in parts_pts:
            parts.append(off)
            off += len(part)
        content = struct.pack("<i4d", SHP_POLYLINE, x0, y0, x1, y1)
        content += struct.pack("<ii", len(parts_pts), len(pts))
        content += b"".join(struct.pack("<i", p) for p in parts)
        content += b"".join(struct.pack("<dd", x, y) for x, y in pts)
        records += struct.pack(">ii", i + 1, len(content) // 2) + content
    _write_shp(path, SHP_POLYLINE, records, _bbox(allpts))


def _write_shp(path: str, shp_type: int, records: bytes, bbox) -> None:
    x0, y0, x1, y1 = bbox
    total_16bit_words = (100 + len(records)) // 2
    header = struct.pack(
        ">i5ii", 9994, 0, 0, 0, 0, 0, total_16bit_words
    ) + struct.pack("<ii8d", 1000, shp_type, x0, y0, x1, y1, 0.0, 0.0, 0.0, 0.0)
    with open(path, "wb") as f:
        f.write(header + records)


def parse_record_content(content: bytes):
    """One .shp record's content → Point (x, y) or Polygon/PolyLine
    list of parts [(x, y), ...] — the shared kernel of the driver-side
    and distributed readers."""
    rtype, = struct.unpack("<i", content[:4])
    if rtype == SHP_POINT:
        return struct.unpack("<dd", content[4:20])
    if rtype in (SHP_POLYGON, SHP_POLYLINE):
        n_parts, n_points = struct.unpack("<ii", content[36:44])
        parts = list(struct.unpack(f"<{n_parts}i", content[44 : 44 + 4 * n_parts]))
        pts_off = 44 + 4 * n_parts
        pts = [
            struct.unpack("<dd", content[pts_off + 16 * i : pts_off + 16 * i + 16])
            for i in range(n_points)
        ]
        bounds = parts + [n_points]
        return [pts[bounds[k] : bounds[k + 1]] for k in range(n_parts)]
    raise NotImplementedError(f"shp record type {rtype}")


def read_shp(path: str):
    """Parse a .shp file → (shp_type, records). Point records are
    (x, y); Polygon records are lists of CLOSED rings [(x, y), ...];
    PolyLine records are lists of open parts (same wire layout as
    Polygon, no closing-vertex rule)."""
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
        out.append(parse_record_content(buf[off : off + length_words * 2]))
        off += length_words * 2
    return shp_type, out


WGS84_WKT = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def write_prj(path: str, wkt: str = WGS84_WKT) -> None:
    with open(path, "w") as f:
        f.write(wkt)


def read_prj(path: str) -> str:
    with open(path) as f:
        return f.read().strip()


def write_shx(path: str, shp_path: str) -> None:
    """.shx index: the .shp header with its own length, then one
    big-endian (offset_words, length_words) pair per record."""
    with open(shp_path, "rb") as f:
        buf = f.read()
    entries = []
    off = 100
    while off < len(buf):
        _recno, length_words = struct.unpack(">ii", buf[off : off + 8])
        entries.append((off // 2, length_words))
        off += 8 + length_words * 2
    header = bytearray(buf[:100])
    header[24:28] = struct.pack(">i", (100 + 8 * len(entries)) // 2)
    with open(path, "wb") as f:
        f.write(bytes(header))
        for o, ln in entries:
            f.write(struct.pack(">ii", o, ln))


def read_shx(path: str) -> list[tuple[int, int]]:
    """[(record_offset_bytes, record_length_bytes)] — lets a reader
    seek straight to record k (the random-access contract a
    range-partitioned import would use)."""
    with open(path, "rb") as f:
        buf = f.read()
    out = []
    for off in range(100, len(buf), 8):
        o, ln = struct.unpack(">ii", buf[off : off + 8])
        out.append((o * 2, ln * 2))
    return out


def write_dbf(path: str, fields: list[tuple[str, str, int, int]], rows: list[dict]) -> None:
    """dBASE III attribute table. fields: (name ≤10 chars, type 'C'|'N',
    byte length, decimal count). N with decimals=0 roundtrips ints
    exactly; decimals>0 formats fixed-point (use dyadic-in-decimal
    fixture values for bit-exact roundtrips)."""
    n = len(rows)
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(f[2] for f in fields)
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 0x03, 95, 1, 1, n, header_size, record_size)
    for name, ftype, length, dec in fields:
        if len(name) > 10:
            raise ValueError(f"dbf field name too long: {name}")
        out += struct.pack(
            "<11sc4xBB14x", name.encode("ascii"), ftype.encode("ascii"), length, dec
        )
    out += b"\x0d"
    for r in rows:
        out += b" "  # not-deleted flag
        for name, ftype, length, dec in fields:
            v = r[name]
            if ftype == "C":
                s = str(v)[:length].ljust(length)
            elif ftype == "N":
                s = (f"{v:.{dec}f}" if dec else f"{int(v)}").rjust(length)
                if len(s) > length:
                    raise ValueError(f"N value {v} overflows width {length}")
            else:
                raise NotImplementedError(f"dbf field type {ftype}")
            out += s.encode("ascii")
    out += b"\x1a"
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_dbf(path: str) -> tuple[list[tuple[str, str, int, int]], list[dict]]:
    """→ (fields, rows). C → stripped str, N → int when decimals=0 else
    float; deleted records (flag 0x2A) are skipped per the spec."""
    with open(path, "rb") as f:
        buf = f.read()
    version = buf[0]
    if version & 0x07 != 0x03:
        raise ValueError(f"unsupported dbf version byte {version:#x}")
    n, header_size, record_size = struct.unpack("<IHH", buf[4:12])
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[off + 11])
        length = buf[off + 16]
        dec = buf[off + 17]
        fields.append((name, ftype, length, dec))
        off += 32
    rows = []
    off = header_size
    for _ in range(n):
        rec = buf[off : off + record_size]
        off += record_size
        if rec[:1] == b"\x2a":
            continue  # deleted
        row = {}
        p = 1
        for name, ftype, length, dec in fields:
            raw = rec[p : p + length].decode("ascii")
            p += length
            if ftype == "C":
                row[name] = raw.rstrip()
            elif ftype == "N":
                s = raw.strip()
                row[name] = (int(s) if s else 0) if dec == 0 else (float(s) if s else 0.0)
            else:
                raise NotImplementedError(f"dbf field type {ftype}")
        rows.append(row)
    return fields, rows


def _attrs_df(spark, dbf_path: str, id_col: str):
    import pandas as pd

    fields, rows = read_dbf(dbf_path)
    pdf = pd.DataFrame(rows)
    pdf.insert(0, id_col, range(len(rows)))
    parts = [f"{id_col} int"]
    for name, ftype, _length, dec in fields:
        parts.append(
            f"{name} string" if ftype == "C" else f"{name} {'long' if dec == 0 else 'double'}"
        )
    return spark.createDataFrame(pdf, schema=", ".join(parts))


def import_polygons_shp(spark, path: str, with_attrs: bool = True):
    """.shp polygons → the engine's multi-ring table (poly_id, ring_idx,
    xs, ys) — closing vertices dropped (engine rings are open). When a
    sibling .dbf exists (and with_attrs), its typed columns join on by
    record order — the shapefile's implicit key — via a broadcast
    attribute join."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

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
    geom = spark.createDataFrame(
        pd.DataFrame(rows, columns=["poly_id", "ring_idx", "xs", "ys"]),
        schema="poly_id int, ring_idx int, xs array<double>, ys array<double>",
    )
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    if with_attrs and os.path.exists(dbf_path):
        geom = geom.join(F.broadcast(_attrs_df(spark, dbf_path, "poly_id")), "poly_id")
    return geom


def import_polygons_shp_distributed(
    spark, path: str, records_per_task: int = 8192
):
    """Scan-scale .shp polygon import [NEXT r3: driver-scale -i]: the
    driver reads ONLY the tiny .shx sidecar (8 bytes per record); the
    record byte-ranges distribute across executors and each task seeks
    into the .shp and parses its slice with the shared record kernel —
    geometry bytes never pass through the driver. Requires the .shp on
    a filesystem every executor can open (local mode / shared FS — the
    same contract ``spark.read`` itself relies on). Output schema and
    values are identical to :func:`import_polygons_shp`'s geometry
    table (join the .dbf attrs the same way if needed)."""
    import math
    import os

    import pandas as pd

    shx = os.path.splitext(path)[0] + ".shx"
    entries = read_shx(shx)  # [(record_header_offset_bytes, content_length_bytes)]
    meta = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": range(len(entries)),
                "off": [o for o, _ in entries],
                "length": [ln for _, ln in entries],
            }
        ),
        schema="poly_id int, off long, length long",
    ).repartition(max(1, math.ceil(len(entries) / records_per_task)))

    def parse(it):
        with open(path, "rb") as f:
            for pdf in it:
                rows = []
                for _, r in pdf.iterrows():
                    f.seek(int(r["off"]) + 8)  # skip the record header
                    rings = parse_record_content(f.read(int(r["length"])))
                    for ri, ring in enumerate(rings):
                        open_ring = (
                            ring[:-1]
                            if len(ring) > 1 and ring[0] == ring[-1]
                            else ring
                        )
                        rows.append(
                            {
                                "poly_id": int(r["poly_id"]),
                                "ring_idx": ri,
                                "xs": [p[0] for p in open_ring],
                                "ys": [p[1] for p in open_ring],
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=["poly_id", "ring_idx", "xs", "ys"]
                )

    return meta.mapInPandas(
        parse,
        schema="poly_id int, ring_idx int, xs array<double>, ys array<double>",
    )


def import_polylines_shp(spark, path: str, with_attrs: bool = True):
    """.shp polylines → (line_id, part_idx, xs, ys) open vertex chains
    [+ .dbf attribute columns by record order when the sidecar
    exists] — the input table of the Cyrus–Beck -clip polyline path."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    shp_type, recs = read_shp(path)
    if shp_type != SHP_POLYLINE:
        raise ValueError("not a polyline shapefile")
    rows = []
    for lid, parts in enumerate(recs):
        for pi, part in enumerate(parts):
            rows.append(
                {
                    "line_id": lid,
                    "part_idx": pi,
                    "xs": [p[0] for p in part],
                    "ys": [p[1] for p in part],
                }
            )
    geom = spark.createDataFrame(
        pd.DataFrame(rows, columns=["line_id", "part_idx", "xs", "ys"]),
        schema="line_id int, part_idx int, xs array<double>, ys array<double>",
    )
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    if with_attrs and os.path.exists(dbf_path):
        geom = geom.join(F.broadcast(_attrs_df(spark, dbf_path, "line_id")), "line_id")
    return geom


def import_points_shp(spark, path: str, with_attrs: bool = True):
    """.shp points → (point_id, lon, lat) [+ .dbf attribute columns by
    record order when the sidecar exists]."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    shp_type, recs = read_shp(path)
    if shp_type != SHP_POINT:
        raise ValueError("not a point shapefile")
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": range(len(recs)),
                "lon": [p[0] for p in recs],
                "lat": [p[1] for p in recs],
            }
        ),
        schema="point_id long, lon double, lat double",
    )
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    if with_attrs and os.path.exists(dbf_path):
        attrs = _attrs_df(spark, dbf_path, "point_id").withColumn(
            "point_id", F.col("point_id").cast("long")
        )
        pts = pts.join(F.broadcast(attrs), "point_id")
    return pts
