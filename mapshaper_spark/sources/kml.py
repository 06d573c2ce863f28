"""Minimal KML codec [SURVEY.md §2.1 -i/-o kml; public OGC KML spec].

Placemark Points and Polygons (outerBoundaryIs + innerBoundaryIs hole
rings — mapping directly onto the engine's multi-ring model, holes
keeping their ring_idx order). Coordinates are written with repr()
(shortest round-trip), so import(export(x)) is bit-exact. Pure stdlib
xml.etree; namespace-tolerant parsing.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

_NS = "http://www.opengis.net/kml/2.2"


def _coords(points) -> str:
    return " ".join(f"{x!r},{y!r}" for x, y in points)


def export_points_kml(points: list[tuple[int, float, float]]) -> str:
    """[(point_id, lon, lat)] → KML document string."""
    pm = "".join(
        f"<Placemark><name>{pid}</name><Point><coordinates>"
        f"{x!r},{y!r}</coordinates></Point></Placemark>"
        for pid, x, y in points
    )
    return f'<?xml version="1.0"?><kml xmlns="{_NS}"><Document>{pm}</Document></kml>'


def export_polygons_kml(features: list[dict]) -> str:
    """[{poly_id, rings: [ring, hole...]}] (open rings; first = outer)
    → KML document string (rings closed per spec)."""
    pms = []
    for f in features:
        rings = [list(r) + [r[0]] for r in f["rings"]]
        outer = (
            "<outerBoundaryIs><LinearRing><coordinates>"
            f"{_coords(rings[0])}</coordinates></LinearRing></outerBoundaryIs>"
        )
        inner = "".join(
            "<innerBoundaryIs><LinearRing><coordinates>"
            f"{_coords(r)}</coordinates></LinearRing></innerBoundaryIs>"
            for r in rings[1:]
        )
        pms.append(
            f"<Placemark><name>{f['poly_id']}</name><Polygon>{outer}{inner}"
            "</Polygon></Placemark>"
        )
    return (
        f'<?xml version="1.0"?><kml xmlns="{_NS}"><Document>'
        + "".join(pms)
        + "</Document></kml>"
    )


def _strip(tag: str) -> str:
    return tag.split("}")[-1]


def _parse_coords(text: str):
    pts = []
    for tok in text.split():
        x, y = tok.split(",")[:2]
        pts.append((float(x), float(y)))
    return pts


def import_kml_all(doc: str) -> dict:
    """KML string → {'points': [(id, x, y)], 'polygons': [{poly_id,
    rings}]} with closing vertices dropped. External-document tolerant:
    a non-integer (or missing) Placemark <name> falls back to a
    sequential id instead of raising, and mixed documents keep BOTH
    layers [ADVICE r2]."""
    root = ET.fromstring(doc)
    placemarks = [pm for pm in root.iter() if _strip(pm.tag) == "Placemark"]

    def _explicit_id(pm):
        for el in pm.iter():
            if _strip(el.tag) == "name":
                try:
                    return int(el.text)
                except (TypeError, ValueError):
                    return None
        return None

    # fallback ids come from a range DISJOINT from every explicit
    # integer name — a per-placemark sequential fallback can collide
    # with another placemark's explicit name in mixed documents,
    # silently merging features downstream [ADVICE r3 #4]
    explicit = [_explicit_id(pm) for pm in placemarks]
    base = max((e for e in explicit if e is not None), default=-1) + 1
    points, polys = [], []
    seq = 0
    for pm, name in zip(placemarks, explicit):
        if name is None:
            name = base + seq
            seq += 1
        for el in pm.iter():
            kind = _strip(el.tag)
            if kind == "Point":
                for c in el.iter():
                    if _strip(c.tag) == "coordinates":
                        (x, y), = _parse_coords(c.text)
                        points.append((name, x, y))
            elif kind == "Polygon":
                rings = []
                for bound in el:
                    bk = _strip(bound.tag)
                    if bk not in ("outerBoundaryIs", "innerBoundaryIs"):
                        continue
                    for c in bound.iter():
                        if _strip(c.tag) == "coordinates":
                            ring = _parse_coords(c.text)
                            if len(ring) > 1 and ring[0] == ring[-1]:
                                ring = ring[:-1]
                            rings.append(ring)
                polys.append({"poly_id": name, "rings": rings})
    return {"points": points, "polygons": polys}


def import_kml(doc: str):
    """Single-layer convenience view over :func:`import_kml_all` (the
    roundtrip contract the codec tests pin): ('polygon', features) when
    the document has any polygon, else ('point', points)."""
    layers = import_kml_all(doc)
    if layers["polygons"]:
        return "polygon", layers["polygons"]
    return "point", layers["points"]
