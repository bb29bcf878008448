"""Round-2 regression tests for the advisor findings:

  * EWKB SRID-flagged points must not enter the vectorized fast path
    (reading SRID bytes as coordinates);
  * spatial_join semi/anti must preserve duplicated rows and rows with
    null passthrough columns (row-identity join, not column equality);
  * from_geoarrow interleaved width-3 must not silently guess xyz.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# EWKB SRID fast-path exclusion
# ---------------------------------------------------------------------------

def _ewkb_point(x: float, y: float, srid: int = 4326) -> bytes:
    # PostGIS-style EWKB: little-endian, type|0x20000000, 4 SRID bytes
    return (b"\x01" + struct.pack("<I", 1 | 0x20000000)
            + struct.pack("<I", srid) + struct.pack("<dd", x, y))


def test_srid_point_excluded_from_fast_path():
    from geospark.kernels.wkb import (_POINT_XY_LEN, parse_point_wkb_buffer,
                                      points_to_wkb_buffer)
    iso_data, iso_off = points_to_wkb_buffer(np.array([1.5]),
                                             np.array([2.5]))
    ewkb = _ewkb_point(10.0, 20.0)
    data = np.concatenate([iso_data,
                           np.frombuffer(ewkb, dtype=np.uint8)])
    offsets = np.array([0, _POINT_XY_LEN, _POINT_XY_LEN + len(ewkb)],
                       dtype=np.int32)
    x, y, ok = parse_point_wkb_buffer(data, offsets, None)
    assert ok[0] and x[0] == 1.5 and y[0] == 2.5
    # the SRID row must NOT claim ok (its bytes 5..21 are SRID+x, not x+y)
    assert not ok[1]


def test_srid_point_correct_via_general_codec():
    from geospark.functions.geometry import wkb_batch_xy
    from geospark.kernels.wkb import parse_wkb
    ewkb = _ewkb_point(12.25, -33.5)
    g = parse_wkb(ewkb)
    assert (g.coords[0, 0], g.coords[0, 1]) == (12.25, -33.5)
    x, y, ok = wkb_batch_xy(pd.Series([ewkb]))
    assert ok[0] and x[0] == 12.25 and y[0] == -33.5


def test_st_xy_on_srid_wkb(spark):
    from pyspark.sql import functions as F
    from geospark.functions.geometry import st_x, st_y
    df = spark.createDataFrame([(1, _ewkb_point(12.25, -33.5))],
                               "id long, wkb binary")
    row = df.select(st_x(F.col("wkb")).alias("x"),
                    st_y(F.col("wkb")).alias("y")).collect()[0]
    assert row.x == 12.25 and row.y == -33.5


# ---------------------------------------------------------------------------
# semi/anti row identity
# ---------------------------------------------------------------------------

def _zones(spark):
    from geospark.queries import fixed_zones_df
    return fixed_zones_df(spark)


def test_semi_anti_null_passthrough_and_duplicates(spark):
    from geospark.operators.joins import spatial_join
    # (-60, -30) is inside zone 1; (150, -80) is in no zone.
    # Row 2 has a null passthrough column; rows 3-4 are duplicates.
    pts = spark.createDataFrame(
        [(1, -30.0, -60.0, "a"),
         (2, -30.0, -60.0, None),   # matched, null passthrough
         (3, -80.0, 150.0, "c"),    # unmatched duplicate
         (3, -80.0, 150.0, "c"),
         (4, -30.0, -60.0, "d"),    # matched duplicate
         (4, -30.0, -60.0, "d")],
        "pid long, lat double, lon double, tag string")
    semi = spatial_join(pts, _zones(spark), res=6, how="left_semi")
    anti = spatial_join(pts, _zones(spark), res=6, how="left_anti")
    semi_rows = sorted((r.pid, r.tag) for r in semi.collect())
    anti_rows = sorted((r.pid, r.tag) for r in anti.collect())
    # null-passthrough matched row must NOT reappear in anti
    assert (2, None) not in anti_rows
    assert (2, None) in semi_rows
    # duplicates preserved on both sides (no distinct collapse)
    assert semi_rows.count((4, "d")) == 2
    assert anti_rows.count((3, "c")) == 2
    assert semi.count() + anti.count() == pts.count()


# ---------------------------------------------------------------------------
# interleaved width-3 ambiguity
# ---------------------------------------------------------------------------

def test_from_geoarrow_3wide_requires_dims(spark):
    from geospark.functions.encoding import from_geoarrow, to_geoarrow
    from geospark.kernels.geom import parse_wkt
    from geospark.kernels.wkb import parse_wkb, write_wkb
    for dims, wkt in (("xyz", "POINT Z (1 2 3)"),
                      ("xym", "POINT M (1 2 3)")):
        df = spark.createDataFrame(
            [(1, write_wkb(parse_wkt(wkt)))], "id long, wkb binary")
        nested = to_geoarrow(df, "wkb", "point", dims=dims,
                             coord_type="interleaved")
        # without dims: must raise, not guess xyz
        with pytest.raises(Exception):
            from_geoarrow(nested, "geom", "point").collect()
        back = from_geoarrow(nested, "geom", "point", dims=dims)
        g = parse_wkb(back.collect()[0].wkb)
        assert (g.has_z, g.has_m) == (dims == "xyz", dims == "xym")
        assert g.coords[0].tolist() == [1.0, 2.0, 3.0]


# ---------------------------------------------------------------------------
# round-2 st_* surface additions
# ---------------------------------------------------------------------------

def test_st_z_dims_distance(spark):
    from pyspark.sql import functions as F
    from geospark.functions.geometry import (st_aswkb, st_dims,
                                             st_distance, st_point,
                                             st_pointz, st_x, st_z)
    from geospark.kernels.geom import parse_wkt
    from geospark.kernels.wkb import write_wkb
    df = spark.createDataFrame([(1, 3.0, 4.0, 7.5)],
                               "id long, lon double, lat double, z double")
    w3 = st_pointz(F.col("lon"), F.col("lat"), F.col("z"))
    w2 = st_point(F.col("lon"), F.col("lat"))
    row = df.select(st_z(w3).alias("z3"), st_dims(w3).alias("d3"),
                    st_z(w2).alias("z2"), st_dims(w2).alias("d2"),
                    st_x(w3).alias("x3"),
                    st_distance(w2, st_point(F.lit(0.0), F.lit(0.0)))
                    .alias("dist")).collect()[0]
    assert row.z3 == 7.5 and row.d3 == "xyz"
    assert row.z2 is None  # NaN -> null for xy point (Arrow mapping)
    assert row.d2 == "xy" and row.x3 == 3.0
    assert row.dist == 5.0

    # st_z on XYM must stay NaN (m is not z); on XYZM returns z
    gm = write_wkb(parse_wkt("POINT M (1 2 9)"))
    gzm = write_wkb(parse_wkt("POINT ZM (1 2 3 9)"))
    d2 = spark.createDataFrame([(gm, gzm)], "a binary, b binary")
    r = d2.select(st_z(F.col("a")).alias("zm"),
                  st_z(F.col("b")).alias("zzm"),
                  st_dims(F.col("a")).alias("dm"),
                  st_dims(F.col("b")).alias("dzm")).collect()[0]
    assert r.zm is None and r.zzm == 3.0
    assert r.dm == "xym" and r.dzm == "xyzm"

    # st_aswkb canonicalizes EWKB (SRID flag) to ISO little-endian
    ew = spark.createDataFrame([(_ewkb_point(5.0, 6.0),)], "w binary")
    out = ew.select(st_aswkb(F.col("w")).alias("c")).collect()[0].c
    assert bytes(out) == write_wkb(parse_wkt("POINT (5 6)"))


def test_st_trygeomfromwkb_null_on_garbage(spark):
    from pyspark.sql import functions as F
    from geospark.functions.geometry import (st_geomfromwkb,
                                             st_trygeomfromwkb)
    from geospark.kernels.geom import parse_wkt
    from geospark.kernels.wkb import write_wkb
    good = write_wkb(parse_wkt("POINT (1 2)"))
    df = spark.createDataFrame(
        [(1, good), (2, b"\x01\x99\x99"), (3, b""), (4, None)],
        "id long, w binary")
    rows = {r.id: r.c for r in df.select(
        "id", st_trygeomfromwkb(F.col("w")).alias("c")).collect()}
    assert bytes(rows[1]) == good
    assert rows[2] is None and rows[3] is None and rows[4] is None
    # the strict variant raises on the same input (documented contract)
    import pytest
    with pytest.raises(Exception):
        df.select(st_geomfromwkb(F.col("w"))).collect()
