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
