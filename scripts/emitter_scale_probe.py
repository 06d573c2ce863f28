"""Probe: the tiled ring emitters at 10k / 30k / 100k features
[VERDICT r4 'Next round' #4 — the r4 10k probes drove three real
optimizations (strict bbox short-circuits, batched assembly, two-level
column-strip crop); one decade up exposes the next straggler], plus
the 50-deep overlap stack for _fold_cell_clean [VERDICT r4 #6].

Layer shape mirrors tests/test_gh_rings.py's 1000-feature fixture at
scale: clusters of 10 chained 2x2 boxes on a cluster grid, one key.
Sizes step x4 with the cluster grid side stepping x2 and the emitter
res stepping +1, so CELLS STAY 3.5 UNITS and per-cell depth m is
IDENTICAL at every size — the 100-TB shape is more cells, not deeper
cells (the per-cell folds are O(m^2); comparing different densities
would measure the layer, not the plan). Per-feature cost ratio ~1
between sizes = the plan scales; >1 = a straggler stage crept in.

Writes BENCH/emitter_probe_100k.json.

Run: python scripts/emitter_scale_probe.py [--sides 32,64,128]
(side 32 = 10,240 features at res 6; side 128 = 163,840 at res 8)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from mapshaper_spark import session  # noqa: E402
from mapshaper_spark.operators import overlay  # noqa: E402


def layer_pdf(side: int) -> pd.DataFrame:
    """Clusters of 10 chained 2x2 boxes on a side x side cluster grid
    (7.0 spacing) — 10·side² features over a 7·side-unit span."""
    n_clusters = side * side
    rows = []
    fid = 0
    for c in range(n_clusters):
        cx0 = 7.0 * (c % side)
        cy0 = 7.0 * (c // side)
        for j in range(10):
            x, y, s = cx0 + 0.3 * j, cy0 + 0.2 * j, 2.0
            rows.append(
                {
                    "feature_id": fid,
                    "key": "k0",
                    "xs": [x, x + s, x + s, x],
                    "ys": [y, y, y + s, y + s],
                }
            )
            fid += 1
    return pd.DataFrame(rows)


def deep_overlap_probe() -> dict:
    """50 concentric-ish overlapping boxes reaching ONE cell: the
    worst-case m for _fold_cell_clean's O(m^2) sequential differences
    [VERDICT r4 #6 — measure the bound, document it]."""
    rows = []
    for i in range(50):
        # staggered strips: box i sticks 0.2 out to the right of every
        # earlier box, so all 50 remainders stay NONEMPTY and the fold
        # runs the full O(m^2) sequence of robust differences; y-edges
        # staggered so no two boxes share an edge line (general
        # position — the probe measures cost, not the degeneracy net)
        x0 = 0.2 * i
        y0 = 0.003 * i
        s = 10.0 - 0.006 * i
        rows.append(
            {
                "feature_id": i,
                "key": "k0",
                "rings_xs": [[x0, x0 + s, x0 + s, x0]],
                "rings_ys": [[y0, y0, y0 + s, y0 + s]],
            }
        )
    pdf = pd.DataFrame(rows)
    t0 = time.time()
    regions = overlay._fold_cell_clean(pdf)
    el = time.time() - t0
    total = 0.0
    from mapshaper_spark import geometry as G

    for _pid, rings in regions:
        total += sum(G.shoelace_area_local(g[:, 0], g[:, 1]) for g in rings)
    return {
        "m": 50,
        "elapsed_sec": round(el, 3),
        "n_regions": len(regions),
        "union_area_from_clean": round(total, 9),
        # truth: clean areas tile the union; union of the stack is the
        # union of box 0 and the staggered remainder strips
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sides", default="32,64")
    ap.add_argument(
        "--ops",
        default="dissolve2_rings,clean_rings,mosaic_face_rings",
        help="comma subset; the x4 step at constant density answers the"
        " superlinearity question for all three, the 163k datapoint"
        " (side 128) is run for the cheapest op to bound wall time",
    )
    ap.add_argument("--out", default="BENCH/emitter_probe_100k.json")
    args = ap.parse_args()
    sides = [int(s) for s in args.sides.split(",")]
    wanted = set(args.ops.split(","))

    spark = session.get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"runs": {}, "deep_overlap": None}
    for side in sides:
        # constant per-cell density: 2^res cells over a 7*side span
        # keeps cells at 3.5 units for side = 32 * 2^k
        res = max(4, int(np.ceil(np.log2(side * 7.0 / 3.5))))
        pdf = layer_pdf(side)
        n = len(pdf)
        feats = spark.createDataFrame(
            pdf,
            schema="feature_id int, key string, xs array<double>, ys array<double>",
        ).localCheckpoint()
        run = {"res": res}
        for name, fn in (
            ("dissolve2_rings", lambda f, r=res: overlay.dissolve2_rings_tiled(
                f, res=r, chunked=True)),
            ("clean_rings", lambda f, r=res: overlay.clean_rings_tiled(
                f, res=r, chunked=True)),
            ("mosaic_face_rings", lambda f, r=res: overlay.mosaic_face_rings_tiled(
                f, res=r, chunked=True)),
        ):
            if name not in wanted:
                continue
            t0 = time.time()
            rings = fn(feats)
            cnt = rings.count()
            el = time.time() - t0
            run[name] = {"sec": round(el, 2), "rows": int(cnt)}
            print(f"n={n} res={res} {name}: {el:.1f}s rows={cnt}", flush=True)
        out["runs"][str(n)] = run
    out["deep_overlap"] = deep_overlap_probe()
    print("deep_overlap:", out["deep_overlap"], flush=True)

    # straggler verdict: per-feature cost ratio between the decades
    ks = sorted(out["runs"], key=int)
    if len(ks) >= 2:
        lo, hi = ks[0], ks[-1]
        ratios = {}
        for op in out["runs"][lo]:
            if op == "res" or op not in out["runs"][hi]:
                continue
            c_lo = out["runs"][lo][op]["sec"] / int(lo)
            c_hi = out["runs"][hi][op]["sec"] / int(hi)
            ratios[op] = round(c_hi / c_lo, 3)
        out["per_feature_cost_ratio_hi_vs_lo"] = ratios
        print("per-feature cost ratios (>1 = superlinear):", ratios, flush=True)
    os.makedirs("BENCH", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
