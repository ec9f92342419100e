"""Geospatial validators (reference: src/truthound/validators/geospatial/).

Lat/lon/bbox are plain comparisons; haversine distance is pure column math
(F.radians/sin/cos/atan2) — all JVM-side. Point-in-polygon (reference
polygon.py ray-casting) is a vectorized pandas UDF (the one genuinely
non-relational computation here).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator, violation_count
from truthound_spark.core.registry import register_validator

EARTH_RADIUS_KM = 6371.0088


@register_validator("latitude", category="geospatial")
class LatitudeValidator(Validator):
    """lat ∈ [-90, 90] (reference: geospatial/coordinate.py:17)."""

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = ((col < -90) | (col > 90)) & col.isNotNull()
        return [
            ExpressionSpec(
                name="latitude",
                issue_type="invalid_latitude",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="[-90, 90]",
            )
        ]


@register_validator("longitude", category="geospatial")
class LongitudeValidator(Validator):
    """lon ∈ [-180, 180] (reference: coordinate.py:92)."""

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = ((col < -180) | (col > 180)) & col.isNotNull()
        return [
            ExpressionSpec(
                name="longitude",
                issue_type="invalid_longitude",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="[-180, 180]",
            )
        ]


@register_validator("not_null_island", category="geospatial")
class NotNullIslandValidator(Validator):
    """(0,0) coordinates flag (reference: coordinate.py:276)."""

    def __init__(self, lat_column: str, lon_column: str) -> None:
        self.lat_column = lat_column
        self.lon_column = lon_column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pred = (F.col(self.lat_column) == 0) & (F.col(self.lon_column) == 0)
        return [
            ExpressionSpec(
                name="not_null_island",
                issue_type="null_island",
                column=f"{self.lat_column},{self.lon_column}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected="no (0,0) coordinates",
            )
        ]


@register_validator("geo_bounding_box", category="geospatial")
class GeoBoundingBoxValidator(Validator):
    """Coordinates within bbox (reference: geospatial/boundary.py:17)."""

    def __init__(self, lat_column: str, lon_column: str, min_lat: float, max_lat: float, min_lon: float, max_lon: float) -> None:
        self.lat_column = lat_column
        self.lon_column = lon_column
        self.bbox = (min_lat, max_lat, min_lon, max_lon)

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lat, lon = F.col(self.lat_column), F.col(self.lon_column)
        mn_lat, mx_lat, mn_lon, mx_lon = self.bbox
        pred = ((lat < mn_lat) | (lat > mx_lat) | (lon < mn_lon) | (lon > mx_lon)) & lat.isNotNull() & lon.isNotNull()
        return [
            ExpressionSpec(
                name="geo_bounding_box",
                issue_type="outside_bounding_box",
                column=f"{self.lat_column},{self.lon_column}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"bbox {self.bbox}",
            )
        ]


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km as pure column math
    (reference: geospatial/distance.py:20 haversine)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


@register_validator("geo_distance_from_point", category="geospatial")
class GeoDistanceFromPointValidator(Validator):
    """Distance from a fixed point ≤ max_km (reference: distance.py:156,
    vectorized variant :278 → here it's one codegen'd expression)."""

    def __init__(self, lat_column: str, lon_column: str, point_lat: float, point_lon: float, max_km: float) -> None:
        self.lat_column = lat_column
        self.lon_column = lon_column
        self.point = (point_lat, point_lon)
        self.max_km = max_km

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lat, lon = F.col(self.lat_column), F.col(self.lon_column)
        dist = haversine_km(lat, lon, F.lit(self.point[0]), F.lit(self.point[1]))
        pred = (dist > self.max_km) & lat.isNotNull() & lon.isNotNull()
        return [
            ExpressionSpec(
                name="geo_distance_from_point",
                issue_type="too_far_from_point",
                column=f"{self.lat_column},{self.lon_column}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"within {self.max_km} km of {self.point}",
            )
        ]


@register_validator("point_in_polygon", category="geospatial")
class PointInPolygonValidator(Validator):
    """Ray-casting point-in-polygon (reference: geospatial/polygon.py:85)
    as an Arrow-vectorized pandas UDF over (lat, lon) batches."""

    def __init__(self, lat_column: str, lon_column: str, polygon: list[tuple[float, float]]) -> None:
        self.lat_column = lat_column
        self.lon_column = lon_column
        self.polygon = polygon

    def validate(self, df: DataFrame, row_count: int | None = None):
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        from truthound_spark.core.results import ValidationIssue
        from truthound_spark.types import severity_from_ratio

        poly = np.asarray(self.polygon, dtype=float)

        @pandas_udf("boolean")
        def inside(lat: pd.Series, lon: pd.Series) -> pd.Series:
            x, y = lon.values, lat.values
            n = len(poly)
            result = np.zeros(len(x), dtype=bool)
            j = n - 1
            for i in range(n):  # loop over polygon vertices, vectorized over rows
                yi, xi = poly[i]
                yj, xj = poly[j]
                cond = ((xi > x) != (xj > x)) & (
                    y < (yj - yi) * (x - xi) / np.where(xj - xi == 0, 1e-12, xj - xi) + yi
                )
                result ^= cond
                j = i
            return pd.Series(result)

        agg = df.select(
            inside(F.col(self.lat_column), F.col(self.lon_column)).alias("__in")
        ).agg(
            F.sum(F.when(~F.col("__in"), 1).otherwise(0)).alias("out"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n_out, n = int(agg["out"] or 0), int(agg["n"] or 0)
        if n_out == 0:
            return []
        return [
            ValidationIssue(
                column=f"{self.lat_column},{self.lon_column}",
                issue_type="outside_polygon",
                count=n_out,
                severity=severity_from_ratio(n_out / n if n else 0.0),
                validator_name="point_in_polygon",
                expected=f"inside polygon ({len(self.polygon)} vertices)",
                actual=n_out,
                details=f"{n_out} points outside polygon",
            )
        ]


#: Coarse country bounding boxes (lat_min, lat_max, lon_min, lon_max) —
#: the reference's GeoCountry check is bbox-level too (boundary.py:138).
COUNTRY_BBOXES: dict[str, tuple[float, float, float, float]] = {
    "US": (24.5, 49.4, -125.0, -66.9),
    "KR": (33.0, 38.7, 124.5, 131.9),
    "JP": (24.0, 45.6, 122.9, 153.99),
    "DE": (47.2, 55.1, 5.8, 15.0),
    "FR": (41.3, 51.1, -5.2, 9.6),
    "GB": (49.9, 60.9, -8.7, 1.8),
    "CN": (18.1, 53.6, 73.5, 135.1),
    "IN": (6.5, 35.5, 68.1, 97.4),
    "BR": (-33.8, 5.3, -73.99, -34.7),
    "AU": (-43.7, -10.0, 112.9, 153.7),
}


@register_validator("geo_country", category="geospatial")
class GeoCountryValidator(Validator):
    """Coordinates must fall inside the named country's bounding box
    (reference: geospatial/boundary.py:138 GeoCountry) — pure column math."""

    def __init__(self, lat_column: str, lon_column: str, country: str) -> None:
        if country not in COUNTRY_BBOXES:
            raise ValueError(f"unknown country {country!r}; known: {sorted(COUNTRY_BBOXES)}")
        self.lat_column = lat_column
        self.lon_column = lon_column
        self.country = country

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lat_min, lat_max, lon_min, lon_max = COUNTRY_BBOXES[self.country]
        lat, lon = F.col(self.lat_column), F.col(self.lon_column)
        outside = ~(
            lat.between(lat_min, lat_max) & lon.between(lon_min, lon_max)
        ) & lat.isNotNull() & lon.isNotNull()
        return [
            ExpressionSpec(
                name="geo_country",
                issue_type="outside_country",
                column=f"{self.lat_column},{self.lon_column}",
                count_expr=violation_count(outside),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=outside,
                expected=f"coordinates within {self.country} bbox",
            )
        ]


@register_validator("multi_polygon", category="geospatial")
class MultiPolygonValidator(Validator):
    """Point must fall inside ANY of several polygons (reference:
    geospatial/polygon.py:386 MultiPolygon) — one vectorized ray-casting
    pass evaluating all polygons per Arrow batch."""

    def __init__(
        self,
        lat_column: str,
        lon_column: str,
        polygons: list[list[tuple[float, float]]],
    ) -> None:
        self.lat_column = lat_column
        self.lon_column = lon_column
        self.polygons = polygons

    def validate(self, df: DataFrame, row_count: int | None = None):
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        from truthound_spark.core.results import ValidationIssue
        from truthound_spark.types import severity_from_ratio

        polys = [np.asarray(p, dtype=float) for p in self.polygons]

        @pandas_udf("boolean")
        def inside_any(lat: pd.Series, lon: pd.Series) -> pd.Series:
            x, y = lon.values, lat.values
            result = np.zeros(len(x), dtype=bool)
            for poly in polys:
                hit = np.zeros(len(x), dtype=bool)
                j = len(poly) - 1
                for i in range(len(poly)):
                    yi, xi = poly[i]
                    yj, xj = poly[j]
                    cond = ((xi > x) != (xj > x)) & (
                        y < (yj - yi) * (x - xi) / np.where(xj - xi == 0, 1e-12, xj - xi) + yi
                    )
                    hit ^= cond
                    j = i
                result |= hit
            return pd.Series(result)

        agg = df.select(
            inside_any(F.col(self.lat_column), F.col(self.lon_column)).alias("__in")
        ).agg(
            F.sum(F.when(~F.col("__in"), 1).otherwise(0)).alias("out"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n_out, n = int(agg["out"] or 0), int(agg["n"] or 0)
        if n_out == 0:
            return []
        return [
            ValidationIssue(
                column=f"{self.lat_column},{self.lon_column}",
                issue_type="outside_polygons",
                count=n_out,
                severity=severity_from_ratio(n_out / n if n else 0.0),
                validator_name="multi_polygon",
                expected=f"inside any of {len(self.polygons)} polygons",
                actual=n_out,
                details=f"{n_out} points outside all polygons",
            )
        ]


@register_validator("coordinate", category="geospatial")
class CoordinateValidator(Validator):
    """Joint lat/lon validity: both present, both in range
    (reference: geospatial/coordinate.py CoordinateValidator)."""

    name = "coordinate"

    def __init__(self, lat_column: str, lon_column: str) -> None:
        self.lat_column = lat_column
        self.lon_column = lon_column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lat, lon = F.col(self.lat_column), F.col(self.lon_column)
        valid = (
            lat.isNotNull()
            & lon.isNotNull()
            & (lat >= -90) & (lat <= 90)
            & (lon >= -180) & (lon <= 180)
        )
        pred = ~valid & (lat.isNotNull() | lon.isNotNull())
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="invalid_coordinate",
                column=f"{self.lat_column},{self.lon_column}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected="lat ∈ [-90,90] and lon ∈ [-180,180], both present",
            )
        ]


@register_validator("geo_distance", category="geospatial")
class GeoDistanceValidator(Validator):
    """Row-wise distance between two coordinate pairs within [min, max]
    (reference: geospatial/distance.py:20-150 GeoDistanceValidator).
    Haversine as one codegen'd column expression; unit km or miles."""

    name = "geo_distance"

    def __init__(
        self,
        lat1_column: str,
        lon1_column: str,
        lat2_column: str,
        lon2_column: str,
        min_distance: float | None = None,
        max_distance: float | None = None,
        unit: str = "km",
    ) -> None:
        if min_distance is None and max_distance is None:
            raise ValueError("One of min_distance/max_distance required")
        if unit not in ("km", "miles"):
            raise ValueError("unit must be 'km' or 'miles'")
        self.cols = (lat1_column, lon1_column, lat2_column, lon2_column)
        self.min_distance = min_distance
        self.max_distance = max_distance
        self.unit = unit

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lat1, lon1, lat2, lon2 = (F.col(c) for c in self.cols)
        dist = haversine_km(lat1, lon1, lat2, lon2)
        if self.unit == "miles":
            dist = dist * 0.621371
        bad = F.lit(False)
        if self.min_distance is not None:
            bad = bad | (dist < self.min_distance)
        if self.max_distance is not None:
            bad = bad | (dist > self.max_distance)
        non_null = lat1.isNotNull() & lon1.isNotNull() & lat2.isNotNull() & lon2.isNotNull()
        pred = bad & non_null
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="geo_distance_out_of_range",
                column=",".join(self.cols),
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=(
                    f"distance in [{self.min_distance},{self.max_distance}] {self.unit}"
                ),
            )
        ]
