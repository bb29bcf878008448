"""Schema inference: the reference's GeoArrowGEOSSchemaCalculator
(geoarrow_geos.c:861-1066) as a pure fold, plus a distributed Spark agg.

State is just ``(geometry_type, dimensions)`` (geoarrow_geos.c:861-864).
Codes use the *calculator convention* (geoarrow_geos.h:125-170 /
FIXTURES.md §2): ``dims_enum*1000 + geometry_type`` with XY encoded as 0
(GEOS only detects 2-D/3-D; 3-D=2000), XYZ=2000, XYM=3000, XYZM=4000;
code 0 (empty/null) is skipped by Ingest (geoarrow_geos.c:1000-1002).

The fold is associative + commutative over sets of distinct codes, so the
Spark version is ``collect_set`` (≤ ~28 distinct codes possible) followed
by a driver-side fold — the reference's one inherently two-pass operator
(SURVEY.md §3 EP3).
"""

from __future__ import annotations

from dataclasses import dataclass

# geometry types (geoarrow enum: GEOMETRY=0, POINT=1 .. GEOMETRYCOLLECTION=7)
GEOMETRY, POINT, LINESTRING, POLYGON = 0, 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION = 4, 5, 6, 7
# dimensions enum
DIM_UNKNOWN, DIM_XY, DIM_XYZ, DIM_XYM, DIM_XYZM = 0, 1, 2, 3, 4
_DIM_STR = {DIM_XY: "xy", DIM_XYZ: "xyz", DIM_XYM: "xym", DIM_XYZM: "xyzm"}

_SIMPLE_MULTI = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING,
                 POLYGON: MULTIPOLYGON}
_MULTI_SIMPLE = {v: k for k, v in _SIMPLE_MULTI.items()}


def promote_type(x: int, y: int) -> int:
    """GeometryType2 (geoarrow_geos.c:883-961). -1 = initial state."""
    if x == -1:
        return y
    if x == GEOMETRY:
        return x
    if y == -1:
        return x
    if x in _SIMPLE_MULTI:           # simple: same or its multi -> y
        if y == x or y == _SIMPLE_MULTI[x]:
            return y
        return GEOMETRY
    if x in _MULTI_SIMPLE:           # multi: its simple or same -> x
        if y == x or y == _MULTI_SIMPLE[x]:
            return x
        return GEOMETRY
    if x == GEOMETRYCOLLECTION:
        return x if y == GEOMETRYCOLLECTION else GEOMETRY
    return GEOMETRY


def promote_dims(x: int, y: int) -> int:
    """Dimensions2 (geoarrow_geos.c:963-995). Note: NOT commutative in the
    reference (XY then XYZ -> XYZ but also XYZ then XY -> XY via the
    'default: return y' arms) — we replicate exactly; over a *set* of
    distinct codes order sensitivity only matters for mixes the tests pin
    (XYZ+XYM -> XYZM both ways, geoarrow_geos_test.cc:533-572)."""
    if x == DIM_UNKNOWN:
        return y
    if y == DIM_UNKNOWN:
        return x
    if x == DIM_XY:
        return y
    if x == DIM_XYZ:
        return DIM_XYZM if y == DIM_XYM else y
    if x == DIM_XYM:
        return DIM_XYZM if y == DIM_XYZ else y
    return DIM_XYZM  # x == XYZM or out-of-range


@dataclass
class SchemaCalculator:
    """Streaming fold (GeoArrowGEOSSchemaCalculatorCreate/Ingest,
    geoarrow_geos.c:866-881, 997-1007)."""

    geometry_type: int = -1
    dimensions: int = DIM_UNKNOWN

    def ingest(self, codes) -> "SchemaCalculator":
        for c in codes:
            c = int(c)
            if c == 0:
                continue
            self.geometry_type = promote_type(self.geometry_type, c % 1000)
            self.dimensions = promote_dims(self.dimensions, c // 1000)
        return self

    def finish(self, encoding: str) -> tuple[str, str | None]:
        """-> (extension_name, dims_string|None). Replicates
        GeoArrowGEOSSchemaCalculatorFinish (geoarrow_geos.c:1009-1062):
        WKT/WKB short-circuit; GEOMETRYCOLLECTION / mixed / all-empty ->
        geoarrow.wkb fallback; unknown dims -> xy. Raises ValueError for
        an unknown encoding (reference: EINVAL)."""
        from .garrow import (ENC_GEOARROW,
                             ENC_GEOARROW_INTERLEAVED, ENC_WKB, ENC_WKT)
        if encoding == ENC_WKT:
            return "geoarrow.wkt", None
        if encoding == ENC_WKB:
            return "geoarrow.wkb", None
        if encoding not in (ENC_GEOARROW, ENC_GEOARROW_INTERLEAVED):
            raise ValueError(f"EINVAL: unknown encoding {encoding!r}")
        if self.geometry_type not in (POINT, LINESTRING, POLYGON,
                                      MULTIPOINT, MULTILINESTRING,
                                      MULTIPOLYGON):
            return "geoarrow.wkb", None  # -1 / GEOMETRY / GC fallback
        dims = self.dimensions
        if dims == DIM_UNKNOWN:
            dims = DIM_XY
        if dims not in _DIM_STR:
            return "geoarrow.wkb", None
        from .garrow import NATIVE_EXTENSIONS
        return (f"geoarrow.{NATIVE_EXTENSIONS[self.geometry_type - 1]}",
                _DIM_STR[dims])


def infer_from_codes(codes, encoding: str) -> tuple[str, str | None]:
    return SchemaCalculator().ingest(codes).finish(encoding)


# ---------------------------------------------------------------------------
# ISO <-> calculator code helpers
# ---------------------------------------------------------------------------

def iso_to_calc(iso: int, is_empty: bool = False) -> int:
    """ISO WKB code -> calculator-convention code. Empty geometries map
    to 0 (geoarrow_geos.h:127-129)."""
    if is_empty or iso == 0:
        return 0
    k, t = divmod(iso, 1000)
    dims_enum = {0: 0, 1: DIM_XYZ, 2: DIM_XYM, 3: DIM_XYZM}[k]
    return dims_enum * 1000 + t


def calc_to_dims_str(code: int) -> str:
    return _DIM_STR.get(code // 1000, "xy")


# ---------------------------------------------------------------------------
# Spark-distributed inference (EP3, SURVEY.md §3)
# ---------------------------------------------------------------------------

def infer_geoarrow_schema(df, code_col: str, encoding: str
                          ) -> tuple[str, str | None]:
    """Distributed schema inference over a DataFrame column of
    calculator-convention type codes: collect_set (tiny — bounded by the
    28 possible codes) then driver-side lattice fold. Two Spark jobs max;
    the agg is map-side combinable so no full shuffle of data rows."""
    from pyspark.sql import functions as F
    rows = df.agg(F.collect_set(code_col).alias("codes")).collect()
    codes = sorted(rows[0]["codes"] or [])
    return infer_from_codes(codes, encoding)
