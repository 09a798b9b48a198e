"""Schemas and lookup tables for the quake pipeline.

The reference declares four schemas (SURVEY.md §1.1); here the input
shape (task.ts:64-79) and output shape (task.ts:212-248) become
explicit StructTypes, and the two module-scope lookup Records
(task.ts:6-18, 21-32) become literal-map column expressions that
Catalyst constant-folds.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- lookup tables (task.ts:6-18 and task.ts:21-32) -----------------

_ICON_PREFIX = "bb4df0a6-ca8d-4ba8-bb9e-3deb97ff015e:NaturalHazards/"

MMI_ICONS: dict[int, str] = {
    1: _ICON_PREFIX + "NH.25A.EarthquakeWeak.png",
    2: _ICON_PREFIX + "NH.25A.EarthquakeWeak.png",
    3: _ICON_PREFIX + "NH.25A.EarthquakeWeak.png",
    4: _ICON_PREFIX + "NH.25A.EarthquakeWeak.png",
    5: _ICON_PREFIX + "NH.26A.EarthquakeLight.png",
    6: _ICON_PREFIX + "NH.27A.EarthquakeModerate.png",
    7: _ICON_PREFIX + "NH.28A.EarthquakeStrong.png",
    8: _ICON_PREFIX + "NH.29A.EarthquakeSevere.png",
    9: _ICON_PREFIX + "NH.29A.EarthquakeSevere.png",
    10: _ICON_PREFIX + "NH.29A.EarthquakeSevere.png",
    11: _ICON_PREFIX + "NH.29A.EarthquakeSevere.png",
}
DEFAULT_ICON = _ICON_PREFIX + "NH.24.Earthquake.png"

# Note: no key 0 — the reference's `'-1'` key plus 1..9 (task.ts:21-32).
# mmi=0 therefore takes the default, which also matches the JS `||`
# falsy-fallback semantics (SURVEY.md §7.4).
MMI_INTENSITY: dict[int, str] = {
    -1: "Unnoticeable",
    1: "Unnoticeable",
    2: "Weak",
    3: "Weak",
    4: "Light",
    5: "Moderate",
    6: "Strong",
    7: "Very Strong",
    8: "Severe",
    9: "Violent",
}
DEFAULT_INTENSITY = "Unknown"

COT_TYPE = "a-o-X-i-g-e"  # Other, Incident, Geophysical, Event (task.ts:217)


def literal_map(d: dict) -> F.Column:
    """A constant MapType column from a Python dict (constant-folded)."""
    pairs: list[F.Column] = []
    for k, v in d.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def map_lookup(d: dict, key: F.Column, default: str) -> F.Column:
    """``d[key] || default`` (task.ts:218,225,236): absent key →
    NULL → default via coalesce."""
    return F.coalesce(F.element_at(literal_map(d), key), F.lit(default))


# --- input schema: GeoNet /quake response (task.ts:64-79) -----------

GEONET_PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("publicID", T.StringType()),
        T.StructField("time", T.StringType()),  # ISO-8601 wire string
        T.StructField("depth", T.DoubleType()),
        T.StructField("magnitude", T.DoubleType()),
        T.StructField("mmi", T.IntegerType()),
        T.StructField("locality", T.StringType()),
        T.StructField("quality", T.StringType()),
    ]
)

GEONET_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("properties", GEONET_PROPERTIES_SCHEMA),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("coordinates", T.ArrayType(T.DoubleType())),
                ]
            ),
        ),
    ]
)

GEONET_RESPONSE_SCHEMA = T.StructType(
    [T.StructField("features", T.ArrayType(GEONET_FEATURE_SCHEMA))]
)

# --- output metadata schema S3 (task.ts:49-59) -----------------------

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("magnitude", T.DoubleType()),
        T.StructField("mmi", T.IntegerType()),
        T.StructField("intensity", T.StringType()),
        T.StructField("locality", T.StringType()),
        T.StructField("depth", T.DoubleType()),
        T.StructField("quality", T.StringType()),
        T.StructField("publicID", T.StringType()),
        T.StructField("timeUTC", T.StringType()),
        T.StructField("timeLocal", T.StringType()),
    ]
)

# --- output feature schema S4 (task.ts:212-248) ----------------------

OUTPUT_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField("callsign", T.StringType()),
                    T.StructField("type", T.StringType()),
                    T.StructField("icon", T.StringType()),
                    T.StructField("time", T.StringType()),
                    T.StructField("start", T.StringType()),
                    T.StructField("stale", T.StringType()),
                    T.StructField("metadata", METADATA_SCHEMA),
                    T.StructField("remarks", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("coordinates", T.ArrayType(T.DoubleType())),
                ]
            ),
        ),
    ]
)


def describe_schema(which: str) -> dict:
    """Schema introspection API (task.ts:145-158 → O29): export a
    declared schema as a JSON-able dict."""
    schemas = {
        "input": GEONET_RESPONSE_SCHEMA,
        "feature": GEONET_FEATURE_SCHEMA,
        "metadata": METADATA_SCHEMA,
        "output": OUTPUT_FEATURE_SCHEMA,
    }
    if which not in schemas:
        raise ValueError(f"unknown schema {which!r}; expected one of {sorted(schemas)}")
    return schemas[which].jsonValue()
