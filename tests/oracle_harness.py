"""Local twin of the driver's correctness gate: run a Spark query and its
DuckDB oracle side by side, compare row count + order-insensitive value
hash (columns sorted by name, rows sorted by all columns, values
normalized the same way on both sides)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_conn(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str = SF_DIR) -> tuple[bool, str]:
    got = normalize(spark_df.toPandas())
    con = duck_conn(sf_dir)
    try:
        want = normalize(con.sql(oracle_sql).df())
    finally:
        con.close()
    if len(got) != len(want):
        return False, f"row count {len(got)} != {len(want)}"
    if list(got.columns) != list(want.columns):
        return False, f"columns {list(got.columns)} != {list(want.columns)}"
    for c in got.columns:
        # Driver-strict: dtype class must agree after normalization. DuckDB
        # integer sum() yields HUGEINT → float64 in pandas, which the driver's
        # value hash rejects against Spark's BIGINT even when 2.0 == 2
        # [VERDICT r1 "What's wrong" #1-2]; catch that class locally.
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if gk != wk:
            return False, f"column {c}: dtype kind {gk!r} (spark) != {wk!r} (oracle)"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            ok = np.allclose(a, b, rtol=0, atol=0, equal_nan=True)
            if not ok:
                # report worst offender for debugging
                d = np.nanmax(np.abs(a - b))
                return False, f"column {c}: max |diff| = {d}"
        else:
            if not (pd.Series(a).fillna("<N>") == pd.Series(b).fillna("<N>")).all():
                i = int(np.argmax(pd.Series(a).fillna("<N>") != pd.Series(b).fillna("<N>")))
                return False, f"column {c}: first mismatch row {i}: {a[i]!r} != {b[i]!r}"
    return True, "ok"
