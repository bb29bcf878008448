"""The reference's geometry-roundtrip fixture corpus
(geoarrow_geos_test.cc:88-334, enumerated in FIXTURES.md §1).

'' denotes a NULL geometry (null != EMPTY). ``wkb_type`` is the ISO code
fed to schema construction for native encodings (MakeSchema convention,
geoarrow_geos.c:1068-1100).
"""

from __future__ import annotations

# (suite, wkb_type, [wkt...]) — single-geometry fixtures, each also
# roundtripped standalone (geoarrow_geos_test.cc:88-115 etc.)
SINGLE_FIXTURES: list[tuple[str, int, str]] = [
    ("point", 1, ""),
    ("point", 1, "POINT EMPTY"),
    ("point", 1, "POINT (0 1)"),
    ("point", 1001, "POINT Z EMPTY"),
    ("point", 1001, "POINT Z (0 1 2)"),
    ("linestring", 2, "LINESTRING EMPTY"),
    ("linestring", 2, "LINESTRING (0 1, 2 3)"),
    ("linestring", 2, "LINESTRING Z EMPTY"),
    ("linestring", 1002, "LINESTRING Z (0 1 2, 3 4 5)"),
    ("polygon", 3, "POLYGON EMPTY"),
    ("polygon", 3, "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))"),
    ("polygon", 3, "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), "
                   "(20 30, 35 35, 30 20, 20 30))"),
    ("polygon", 1003, "POLYGON Z EMPTY"),
    ("polygon", 1003,
     "POLYGON Z ((30 10 40, 40 40 80, 20 40 60, 10 20 30, 30 10 40))"),
    ("polygon", 1003,
     "POLYGON Z ((35 10 45, 45 45 90, 15 40 55, 10 20 30, 35 10 45), "
     "(20 30 50, 35 35 70, 30 20 50, 20 30 50))"),
    ("multipoint", 4, "MULTIPOINT EMPTY"),
    ("multipoint", 4, "MULTIPOINT (30 10)"),
    ("multipoint", 4, "MULTIPOINT (30 10, 40 30, 20 20)"),
    ("multipoint", 4, "MULTIPOINT (10 40, 40 30, 20 20, 30 10)"),
    ("multilinestring", 5, "MULTILINESTRING EMPTY"),
    ("multilinestring", 5, "MULTILINESTRING ((30 10, 10 30, 40 40))"),
    ("multilinestring", 5,
     "MULTILINESTRING ((10 10, 20 20, 10 40), "
     "(40 40, 30 30, 40 20, 30 10))"),
    ("multipolygon", 6, "MULTIPOLYGON EMPTY"),
    ("multipolygon", 6,
     "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
     "((15 5, 40 10, 10 20, 5 10, 15 5)))"),
    ("multipolygon", 6,
     "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)), "
     "((20 35, 10 30, 10 10, 30 5, 45 20, 20 35), "
     "(30 20, 20 15, 20 25, 30 20)))"),
]

# (suite, wkb_type, [wkt|'' ...]) — batch fixtures with interleaved
# nulls/empties (geoarrow_geos_test.cc:188-333)
BATCH_FIXTURES: list[tuple[str, int, list[str]]] = [
    ("point", 1, []),
    ("point", 1001, []),
    ("linestring", 2, []),
    ("linestring", 1002, []),
    ("polygon", 3, []),
    ("polygon", 1003, []),
    ("multipoint", 4, []),
    ("multipoint", 1004, []),
    ("multilinestring", 5, []),
    ("multilinestring", 1005, []),
    ("multipolygon", 6, []),
    ("multipolygon", 1006, []),
    ("point", 1,
     ["POINT EMPTY", "POINT (0 1)", "POINT (2 3)", "POINT EMPTY", ""]),
    ("point", 1001,
     ["POINT Z EMPTY", "POINT Z (0 1 2)", "POINT Z (3 4 5)",
      "POINT Z EMPTY", ""]),
    ("linestring", 2,
     ["LINESTRING EMPTY", "LINESTRING (0 1, 2 3)",
      "LINESTRING (4 5, 6 7, 8 9)", "LINESTRING EMPTY", ""]),
    ("linestring", 1002,
     ["LINESTRING Z EMPTY", "LINESTRING Z (0 1 2, 3 4 5)",
      "LINESTRING Z (6 7 8, 9 10 11, 12 13 14)", "LINESTRING Z EMPTY",
      ""]),
    ("polygon", 3,
     ["POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
      "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), "
      "(20 30, 35 35, 30 20, 20 30))",
      "POLYGON EMPTY", ""]),
    ("polygon", 1003,
     ["POLYGON Z ((30 10 40, 40 40 80, 20 40 60, 10 20 30, 30 10 40))",
      "POLYGON Z ((35 10 45, 45 45 90, 15 40 55, 10 20 30, 35 10 45), "
      "(20 30 50, 35 35 70, 30 20 50, 20 30 50))",
      "POLYGON Z EMPTY", ""]),
    ("multipoint", 4,
     ["MULTIPOINT ((30 10))",
      "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))",
      "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))", ""]),
    ("multipoint", 1004,
     ["MULTIPOINT Z ((30 10 40))",
      "MULTIPOINT Z ((10 40 50), (40 30 70), (20 20 40), (30 10 40))",
      "MULTIPOINT Z ((10 40 50), (40 30 70), (20 20 40), (30 10 40))",
      "MULTIPOINT Z EMPTY", ""]),
    ("multilinestring", 5,
     ["MULTILINESTRING ((30 10, 10 30, 40 40))",
      "MULTILINESTRING ((10 10, 20 20, 10 40), "
      "(40 40, 30 30, 40 20, 30 10))",
      "MULTILINESTRING EMPTY", ""]),
    ("multilinestring", 1005,
     ["MULTILINESTRING Z ((30 10 40, 10 30 40, 40 40 80))",
      "MULTILINESTRING Z ((10 10 20, 20 20 40, 10 40 50), "
      "(40 40 80, 30 30 60, 40 20 60, 30 10 40))",
      "MULTILINESTRING Z EMPTY", ""]),
    ("multipolygon", 6,
     ["MULTIPOLYGON (((30 10, 40 40, 20 40, 10 20, 30 10)))",
      "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
      "((15 5, 40 10, 10 20, 5 10, 15 5)))",
      "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)), "
      "((20 35, 10 30, 10 10, 30 5, 45 20, 20 35), "
      "(30 20, 20 15, 20 25, 30 20)))",
      "MULTIPOLYGON EMPTY", ""]),
    ("multipolygon", 1006,
     ["MULTIPOLYGON Z (((30 10 40, 40 40 80, 20 40 60, 10 20 30, "
      "30 10 40)))",
      "MULTIPOLYGON Z (((30 20 50, 45 40 85, 10 40 50, 30 20 50)), "
      "((15 5 20, 40 10 50, 10 20 30, 5 10 15, 15 5 20)))",
      "MULTIPOLYGON Z (((40 40 80, 20 45 65, 45 30 75, 40 40 80)), "
      "((20 35 55, 10 30 40, 10 10 20, 30 5 35, 45 20 65, 20 35 55), "
      "(30 20 50, 20 15 35, 20 25 45, 30 20 50)))",
      "MULTIPOLYGON Z EMPTY", ""]),
]


def wkb_type_to_ext_dims(wkb_type: int) -> tuple[str, str]:
    """ISO suite code -> (extension, dims) for native-encoding schemas
    (MakeSchema: dimensions = wkb_type/1000 + 1, geoarrow_geos.c:1094)."""
    from .garrow import NATIVE_EXTENSIONS
    k, t = divmod(wkb_type, 1000)
    dims = {0: "xy", 1: "xyz", 2: "xym", 3: "xyzm"}[k]
    return NATIVE_EXTENSIONS[t - 1], dims
