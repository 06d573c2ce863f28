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


def albers(
    df: DataFrame,
    lat1: float = 29.5,
    lat2: float = 45.5,
    lon0: float = -96.0,
    lat0: float = 23.0,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Spherical Albers equal-area conic (upstream's albersusa default
    parallels). Forward: n = (sin f1 + sin f2)/2, C = cos^2 f1 +
    2 n sin f1, rho = R sqrt(C - 2 n sin f)/n, th = n (lam - lam0);
    x = rho sin th, y = rho0 - rho cos th. Pure codegen column math."""
    f1, f2 = math.radians(lat1), math.radians(lat2)
    n = (math.sin(f1) + math.sin(f2)) / 2.0
    c = math.cos(f1) ** 2 + 2.0 * n * math.sin(f1)
    rho0 = R * math.sqrt(c - 2.0 * n * math.sin(math.radians(lat0))) / n
    rho = F.lit(R) * F.sqrt(F.lit(c) - F.lit(2.0 * n) * F.sin(F.radians(F.col(lat)))) / F.lit(n)
    th = F.lit(n) * F.radians(F.col(lon) - F.lit(lon0))
    return df.withColumn("ax", rho * F.sin(th)).withColumn(
        "ay", F.lit(rho0) - rho * F.cos(th)
    )


def albers_inverse(
    df: DataFrame,
    lat1: float = 29.5,
    lat2: float = 45.5,
    lon0: float = -96.0,
    lat0: float = 23.0,
    ax: str = "ax",
    ay: str = "ay",
) -> DataFrame:
    f1, f2 = math.radians(lat1), math.radians(lat2)
    n = (math.sin(f1) + math.sin(f2)) / 2.0
    c = math.cos(f1) ** 2 + 2.0 * n * math.sin(f1)
    rho0 = R * math.sqrt(c - 2.0 * n * math.sin(math.radians(lat0))) / n
    dy = F.lit(rho0) - F.col(ay)
    rho = F.sqrt(F.col(ax) * F.col(ax) + dy * dy)
    th = F.atan2(F.col(ax), dy)  # n > 0 for northern standard parallels
    lat_out = F.degrees(
        F.asin((F.lit(c) - (rho * F.lit(n) / F.lit(R)) * (rho * F.lit(n) / F.lit(R))) / F.lit(2.0 * n))
    )
    lon_out = F.lit(lon0) + F.degrees(th / F.lit(n))
    return df.withColumn("lon2", lon_out).withColumn("lat2", lat_out)


def lambert_cc(
    df: DataFrame,
    lat1: float = 33.0,
    lat2: float = 45.0,
    lon0: float = -96.0,
    lat0: float = 39.0,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Spherical Lambert conformal conic. n from the two standard
    parallels, rho = R Fc / tan^n(pi/4 + f/2)."""
    f1, f2 = math.radians(lat1), math.radians(lat2)
    n = math.log(math.cos(f1) / math.cos(f2)) / math.log(
        math.tan(math.pi / 4.0 + f2 / 2.0) / math.tan(math.pi / 4.0 + f1 / 2.0)
    )
    fc = math.cos(f1) * math.tan(math.pi / 4.0 + f1 / 2.0) ** n / n
    rho0 = R * fc / math.tan(math.pi / 4.0 + math.radians(lat0) / 2.0) ** n
    rho = F.lit(R * fc) / F.pow(
        F.tan(F.lit(math.pi / 4.0) + F.radians(F.col(lat)) / 2.0), F.lit(n)
    )
    th = F.lit(n) * F.radians(F.col(lon) - F.lit(lon0))
    return df.withColumn("lx", rho * F.sin(th)).withColumn(
        "ly", F.lit(rho0) - rho * F.cos(th)
    )


def lambert_cc_inverse(
    df: DataFrame,
    lat1: float = 33.0,
    lat2: float = 45.0,
    lon0: float = -96.0,
    lat0: float = 39.0,
    lx: str = "lx",
    ly: str = "ly",
) -> DataFrame:
    f1, f2 = math.radians(lat1), math.radians(lat2)
    n = math.log(math.cos(f1) / math.cos(f2)) / math.log(
        math.tan(math.pi / 4.0 + f2 / 2.0) / math.tan(math.pi / 4.0 + f1 / 2.0)
    )
    fc = math.cos(f1) * math.tan(math.pi / 4.0 + f1 / 2.0) ** n / n
    rho0 = R * fc / math.tan(math.pi / 4.0 + math.radians(lat0) / 2.0) ** n
    dy = F.lit(rho0) - F.col(ly)
    rho = F.sqrt(F.col(lx) * F.col(lx) + dy * dy)  # n > 0
    th = F.atan2(F.col(lx), dy)
    lat_out = F.degrees(
        F.lit(2.0) * F.atan(F.pow(F.lit(R * fc) / rho, F.lit(1.0 / n)))
        - F.lit(math.pi / 2.0)
    )
    lon_out = F.lit(lon0) + F.degrees(th / F.lit(n))
    return df.withColumn("lon2", lon_out).withColumn("lat2", lat_out)
