"""Tier 0 — kernel roundtrips against the reference fixture corpus.

Mirrors the reference's test strategy (SURVEY.md §5.1): roundtrip property
tests parameterized over all four encodings (geoarrow_geos_test.cc:336-340),
builder WKT-bytes checks, schema-inference matrix. Pure NumPy — no Spark
session — so this tier stays fast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from geospark.kernels import corpus, schema as gschema
from geospark.kernels.garrow import (ALL_ENCODINGS, ENC_GEOARROW,
                                     ENC_GEOARROW_INTERLEAVED, ENC_WKB,
                                     ENC_WKT, decode, encode, from_pyarrow,
                                     geoarrow_to_geoms, geoms_to_geoarrow,
                                     to_pyarrow)
from geospark.kernels.geom import Geom, format_wkt, parse_wkt
from geospark.kernels.wkb import (parse_point_wkb_buffer, parse_wkb,
                                  points_to_wkb_buffer, write_wkb)


def _roundtrip(wkts: list[str], wkb_type: int, encoding: str) -> None:
    geoms = [parse_wkt(w) for w in wkts]
    ext, dims = corpus.wkb_type_to_ext_dims(wkb_type)
    if encoding in (ENC_GEOARROW, ENC_GEOARROW_INTERLEAVED):
        arr, fld = encode(geoms, encoding, extension=ext, dims=dims)
        assert fld.metadata[b"ARROW:extension:name"] == \
            f"geoarrow.{ext}".encode()
        back = decode(arr, f"geoarrow.{ext}")
    else:
        arr, fld = encode(geoms, encoding)
        assert fld.metadata[b"ARROW:extension:name"] == \
            f"geoarrow.{encoding}".encode()
        back = decode(arr)
    assert len(back) == len(geoms)
    for g, b in zip(geoms, back):
        if g is None:
            assert b is None, f"null lost: {b}"
        else:
            assert b is not None and g.equals_exact(b), \
                f"roundtrip mismatch [{encoding}]: " \
                f"{format_wkt(g)} -> {format_wkt(b)}"


@pytest.mark.parametrize("encoding", ALL_ENCODINGS)
@pytest.mark.parametrize("suite,wkb_type,wkt", corpus.SINGLE_FIXTURES)
def test_single_roundtrip(suite, wkb_type, wkt, encoding):
    _roundtrip([wkt], wkb_type, encoding)


@pytest.mark.parametrize("encoding", ALL_ENCODINGS)
@pytest.mark.parametrize(
    "suite,wkb_type,wkts",
    [(s, t, w) for s, t, w in corpus.BATCH_FIXTURES],
    ids=[f"{s}-{t}-n{len(w)}" for s, t, w in corpus.BATCH_FIXTURES])
def test_batch_roundtrip(suite, wkb_type, wkts, encoding):
    _roundtrip(wkts, wkb_type, encoding)


def test_wkt_parse_format_idempotent():
    for _, _, wkt in corpus.SINGLE_FIXTURES:
        g = parse_wkt(wkt)
        if g is None:
            continue
        s = format_wkt(g)
        g2 = parse_wkt(s)
        assert g.equals_exact(g2), f"{wkt} -> {s}"
        assert format_wkt(g2) == s  # canonical form is stable


def test_null_vs_empty_distinct():
    # null != EMPTY end to end (geoarrow_geos.c:170-173 vs 692-694)
    geoms = [parse_wkt(""), parse_wkt("POINT EMPTY"), parse_wkt("POINT (0 1)")]
    assert geoms[0] is None
    assert geoms[1].is_empty and not geoms[2].is_empty
    for encoding in ALL_ENCODINGS:
        arr, _ = encode(geoms, encoding, extension="point", dims="xy")
        assert arr.null_count == 1
        back = (decode(arr, "geoarrow.point")
                if encoding.startswith("geoarrow") else decode(arr))
        assert back[0] is None
        assert back[1] is not None and back[1].is_empty
        assert back[2] is not None and not back[2].is_empty


def test_wkb_bytes_stable():
    # ISO little-endian layout: POINT (0 1)
    g = parse_wkt("POINT (0 1)")
    b = write_wkb(g)
    assert b[:5] == b"\x01\x01\x00\x00\x00"
    assert len(b) == 21
    assert parse_wkb(b).equals_exact(g)
    # Z code 1001
    gz = parse_wkt("POINT Z (0 1 2)")
    bz = write_wkb(gz)
    assert bz[1:5] == (1001).to_bytes(4, "little")
    assert len(bz) == 29


def test_wkb_big_endian_read():
    import struct
    buf = struct.pack(">BIdd", 0, 1, 30.0, 10.0)
    g = parse_wkb(buf)
    assert g.equals_exact(parse_wkt("POINT (30 10)"))


def test_native_geometrycollection_unsupported():
    # reference parity: native GC decode -> ENOTSUP (geoarrow_geos.c:827-830)
    with pytest.raises(NotImplementedError):
        from_pyarrow(pa.array([[1.0, 2.0]], type=pa.list_(
            pa.field("xy", pa.float64(), nullable=False), 2)),
            "geoarrow.geometrycollection")


def test_gc_wkb_roundtrip():
    # GC is encodable/decodable via WKB/WKT (builder can visit it,
    # geoarrow_geos.c:285-298)
    wkt = "GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (0 1, 2 3))"
    g = parse_wkt(wkt)
    assert parse_wkb(write_wkb(g)).equals_exact(g)
    assert parse_wkt(format_wkt(g)).equals_exact(g)


# ---------------------------------------------------------------------------
# dims recoverable by child-name concatenation (geoarrow_geos_test.cc:447-458)
# ---------------------------------------------------------------------------

def test_dims_child_names():
    g = [parse_wkt("POINT Z (0 1 2)")]
    arr, _ = encode(g, ENC_GEOARROW, extension="point", dims="xyz")
    assert [arr.type.field(i).name for i in range(3)] == ["x", "y", "z"]
    arr2, _ = encode(g, ENC_GEOARROW_INTERLEAVED, extension="point",
                     dims="xyz")
    assert arr2.type.value_field.name == "xyz"
    ls = [parse_wkt("LINESTRING (0 1, 2 3)")]
    arr3, _ = encode(ls, ENC_GEOARROW, extension="linestring", dims="xy")
    assert arr3.type.value_field.name == "vertices"


# ---------------------------------------------------------------------------
# schema-inference matrix (FIXTURES.md §2 / geoarrow_geos_test.cc:460-681)
# ---------------------------------------------------------------------------

def test_infer_empty_input():
    with pytest.raises(ValueError):
        gschema.infer_from_codes([], "nope")
    assert gschema.infer_from_codes([], ENC_WKT) == ("geoarrow.wkt", None)
    assert gschema.infer_from_codes([], ENC_WKB) == ("geoarrow.wkb", None)
    for enc in (ENC_GEOARROW, ENC_GEOARROW_INTERLEAVED):
        assert gschema.infer_from_codes([], enc) == ("geoarrow.wkb", None)


@pytest.mark.parametrize("codes,name,dims", [
    ([1, 2001], "geoarrow.point", "xyz"),
    ([2001, 1], "geoarrow.point", "xyz"),
    ([2001, 2001], "geoarrow.point", "xyz"),
    ([1, 3001], "geoarrow.point", "xym"),
    ([3001, 1], "geoarrow.point", "xym"),
    ([3001, 3001], "geoarrow.point", "xym"),
    ([2001, 3001], "geoarrow.point", "xyzm"),
    ([3001, 2001], "geoarrow.point", "xyzm"),
    ([2001, 4001], "geoarrow.point", "xyzm"),
    ([4001, 2001], "geoarrow.point", "xyzm"),
    ([3001, 4001], "geoarrow.point", "xyzm"),
    ([4001, 3001], "geoarrow.point", "xyzm"),
])
def test_infer_dims_promotion(codes, name, dims):
    # exact order as the reference tests ingest (not pre-sorted)
    assert gschema.infer_from_codes(codes, ENC_GEOARROW) == (name, dims)


_MATRIX = [
    # (non_null, non_null_simple, non_null_mixed, expected name, dims)
    ("POINT (0 1)", None, "LINESTRING (0 1, 2 3)", "geoarrow.point", "xy"),
    ("LINESTRING (0 1, 2 3)", None, "POINT (0 1)",
     "geoarrow.linestring", "xy"),
    ("POLYGON ((0 0, 1 0, 0 1, 0 0))", None, "POINT (0 1)",
     "geoarrow.polygon", "xy"),
    ("MULTIPOINT (0 1)", "POINT (0 1)", "LINESTRING (0 1, 2 3)",
     "geoarrow.multipoint", "xy"),
    ("MULTILINESTRING ((0 1, 2 3))", "LINESTRING (0 1, 2 3)", "POINT (0 1)",
     "geoarrow.multilinestring", "xy"),
    ("MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)))", "POLYGON ((0 0, 1 0, 0 1, 0 0))",
     "POINT (0 1)", "geoarrow.multipolygon", "xy"),
    ("GEOMETRYCOLLECTION (POINT (0 1))", None, None, "geoarrow.wkb", None),
    ("POINT Z (0 1 2)", "POINT (0 1)", "LINESTRING (0 1, 2 3)",
     "geoarrow.point", "xyz"),
]


def _codes(wkts):
    return [0 if w is None else
            (0 if (g := parse_wkt(w)) is None else g.calc_code())
            for w in wkts]


@pytest.mark.parametrize("nn,nns,nnm,name,dims", _MATRIX)
def test_infer_matrix(nn, nns, nnm, name, dims):
    # 8 sub-cases per row (geoarrow_geos_test.cc:580-655)
    exp = (name, dims)
    infer = lambda ws: gschema.infer_from_codes(_codes(ws), ENC_GEOARROW)  # noqa
    assert infer([nn]) == exp
    assert infer([None, nn]) == exp               # null first (code 0)
    assert infer([nn, None]) == exp
    assert infer([nn, nn]) == exp                 # dup
    assert infer([nn, "POINT EMPTY"]) == exp      # empty skipped
    if nns is not None:
        assert infer([nns, nn]) == exp            # simple + multi
        assert infer([nn, nns]) == exp            # multi + simple
    if nnm is not None:
        assert infer([nn, nnm]) == ("geoarrow.wkb", None)  # cross-family


def test_calc_code_convention():
    # geoarrow_geos.h:125-170: empty -> 0, 2-D -> bare type, 3-D -> 2000+t
    assert parse_wkt("POINT EMPTY").calc_code() == 0
    assert parse_wkt("POINT (0 1)").calc_code() == 1
    assert parse_wkt("POINT Z (0 1 2)").calc_code() == 2001
    assert parse_wkt("MULTIPOLYGON EMPTY").calc_code() == 0
    assert parse_wkt(
        "MULTIPOLYGON Z (((0 0 0, 1 0 0, 0 1 0, 0 0 0)))").calc_code() == 2006
    # ISO convention at the user surface
    assert parse_wkt("POINT Z (0 1 2)").iso_code == 1001


# ---------------------------------------------------------------------------
# vectorized point fast path
# ---------------------------------------------------------------------------

def test_point_fast_path_roundtrip():
    rng = np.random.default_rng(42)
    x = rng.uniform(-180, 180, 1000)
    y = rng.uniform(-90, 90, 1000)
    data, offsets = points_to_wkb_buffer(x, y)
    # cross-check a sample against the general codec
    for i in (0, 7, 999):
        b = data[offsets[i]:offsets[i + 1]].tobytes()
        g = parse_wkb(b)
        assert g.type_id == 1
        assert g.coords[0, 0] == x[i] and g.coords[0, 1] == y[i]
    x2, y2, ok = parse_point_wkb_buffer(data, offsets, None)
    assert ok.all()
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)


def test_point_fast_path_nulls_and_nonpoints():
    wkbs = [write_wkb(parse_wkt("POINT (1 2)")), None,
            write_wkb(parse_wkt("LINESTRING (0 1, 2 3)")),
            write_wkb(parse_wkt("POINT EMPTY"))]
    arr = pa.array(wkbs, type=pa.binary())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + 1)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    validity = ~np.asarray(arr.is_null())
    x, y, ok = parse_point_wkb_buffer(data, offsets.astype(np.int64),
                                      validity)
    assert list(ok) == [True, False, False, False]
    assert x[0] == 1 and y[0] == 2


# ---------------------------------------------------------------------------
# XYM / XYZM corpus roundtrips (round 2): the reference pins xym/xyzm in
# its schema matrix (geoarrow_geos_test.cc:485-572); these fixtures pin
# actual M-coordinate roundtrips through all four encodings.
# ---------------------------------------------------------------------------

M_CORPUS = [
    (2001, "POINT M (30 10 300)"),
    (3001, "POINT ZM (30 10 40 300)"),
    (2002, "LINESTRING M (30 10 1, 10 30 2, 40 40 3)"),
    (3002, "LINESTRING ZM (30 10 40 1, 10 30 40 2)"),
    (2003, "POLYGON M ((30 10 1, 40 40 2, 20 40 3, 30 10 1))"),
    (3003, "POLYGON ZM ((30 10 40 1, 40 40 80 2, 20 40 60 3, "
            "30 10 40 1))"),
    (2004, "MULTIPOINT M (30 10 1, 10 30 2)"),
    (3005, "MULTILINESTRING ZM ((30 10 40 1, 10 30 40 2), "
            "(35 15 45 5, 15 35 45 6))"),
    (2006, "MULTIPOLYGON M (((30 10 1, 40 40 2, 20 40 3, 30 10 1)))"),
    (3006, "MULTIPOLYGON ZM (((30 10 40 1, 40 40 80 2, 20 40 60 3, "
            "30 10 40 1)))"),
]


@pytest.mark.parametrize("encoding", ALL_ENCODINGS)
@pytest.mark.parametrize("wkb_type,wkt", M_CORPUS)
def test_m_corpus_roundtrip(wkb_type, wkt, encoding):
    _roundtrip([wkt], wkb_type, encoding)


@pytest.mark.parametrize("encoding", ALL_ENCODINGS)
def test_m_corpus_batch_with_nulls(encoding):
    # mixed batch: M geometries adjacent to nulls and EMPTY (the
    # null-vs-empty distinction of SURVEY.md §1.3, now in XYM)
    wkts = ["POINT M (1 2 3)", None, "POINT M EMPTY", "POINT M (4 5 6)"]
    geoms = [parse_wkt(w) if w is not None else None for w in wkts]
    if encoding in (ENC_GEOARROW, ENC_GEOARROW_INTERLEAVED):
        arr, _ = encode(geoms, encoding, extension="point", dims="xym")
        back = decode(arr, "geoarrow.point")
    else:
        arr, _ = encode(geoms, encoding)
        back = decode(arr)
    assert back[1] is None
    assert back[2] is not None and back[2].is_empty and back[2].has_m
    for i in (0, 3):
        assert back[i].equals_exact(geoms[i]) and back[i].has_m


# ---------------------------------------------------------------------------
# planar measures: st_area / st_centroid kernels
# ---------------------------------------------------------------------------

def test_geom_area_centroid():
    from geospark.kernels.ops import geom_area, geom_centroid
    sq = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert geom_area(sq) == 16.0
    assert geom_centroid(sq) == (2.0, 2.0)
    # orientation-independent (reversed ring)
    sq_cw = parse_wkt("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))")
    assert geom_area(sq_cw) == 16.0
    assert geom_centroid(sq_cw) == (2.0, 2.0)
    # hole subtracts; centroid shifts away from the hole
    holed = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                      "(2 1, 3 1, 3 2, 2 2, 2 1))")
    assert geom_area(holed) == 15.0
    cx, cy = geom_centroid(holed)
    assert cx < 2.0 and cy > 2.0 - 1e-9
    # multipolygon sums; empty/none/zero-area behave
    mp = parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
                   "((10 10, 12 10, 12 11, 10 11, 10 10)))")
    assert geom_area(mp) == 3.0
    cx, cy = geom_centroid(mp)
    # area-weighted: (0.5,0.5)*1 + (11,10.5)*2 over 3
    assert abs(cx - (0.5 + 22.0) / 3.0) < 1e-12
    assert abs(cy - (0.5 + 21.0) / 3.0) < 1e-12
    assert geom_area(parse_wkt("POLYGON EMPTY")) == 0.0
    assert geom_area(None) == 0.0
    assert geom_area(parse_wkt("POINT (1 2)")) == 0.0
    assert geom_centroid(parse_wkt("POINT (1 2)")) == (1.0, 2.0)
    import numpy as np
    assert np.isnan(geom_centroid(parse_wkt("POLYGON EMPTY"))[0])
