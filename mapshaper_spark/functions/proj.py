"""-proj: the two projections the engine needs [SURVEY.md §2.2 -proj —
full PROJ port explicitly out of scope; fixtures use lonlat and
WebMercator only].

Pure column expressions (JVM-side, codegen). tan/log are not
ULP-portable across libm implementations, so WebMercator outputs are
pytest-golden-checked rather than DuckDB-oracle-hashed [SURVEY.md §5.2].
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R = 6378137.0  # WGS84 spherical radius (WebMercator convention)
MAX_LAT = 85.05112878  # WebMercator latitude clamp


def to_webmercator(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """EPSG:4326 → EPSG:3857: x = R·λ, y = R·ln(tan(π/4 + φ/2))."""
    lat_c = F.least(F.lit(MAX_LAT), F.greatest(F.lit(-MAX_LAT), F.col(lat)))
    x = F.lit(R) * F.radians(F.col(lon))
    y = F.lit(R) * F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat_c) / 2.0))
    return df.withColumn("mx", x).withColumn("my", y)


def from_webmercator(df: DataFrame, mx: str = "mx", my: str = "my") -> DataFrame:
    """EPSG:3857 → EPSG:4326 inverse."""
    lon = F.degrees(F.col(mx) / F.lit(R))
    lat = F.degrees(
        F.lit(2.0) * F.atan(F.exp(F.col(my) / F.lit(R))) - F.lit(math.pi / 2.0)
    )
    return df.withColumn("lon2", lon).withColumn("lat2", lat)


def webmercator_tile(df: DataFrame, z: int, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Slippy-map z/x/y tile ids in the WebMercator scheme (the scheme
    real tile servers use; the oracle-checked engine tiling stays on the
    algebraic equirectangular grid [cells.tile_sql])."""
    n = 1 << z
    lat_c = F.least(F.lit(MAX_LAT), F.greatest(F.lit(-MAX_LAT), F.col(lat)))
    xt = F.floor((F.col(lon) + 180.0) / 360.0 * n)
    lat_r = F.radians(lat_c)
    yt = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi) / 2.0 * n
    )
    clamp = lambda c: F.least(F.lit(n - 1), F.greatest(F.lit(0), c.cast("long")))  # noqa: E731
    return df.withColumn("wm_tile_x", clamp(xt)).withColumn("wm_tile_y", clamp(yt))
