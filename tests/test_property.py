"""Property tests (hypothesis): extend the reference's roundtrip
property style (geoarrow_geos_test.cc:117-166) from the fixed corpus to
randomized geometries, and cross-check the ray-cast against an
independent crossing-number implementation."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geospark.kernels.garrow import ALL_ENCODINGS, decode, encode
from geospark.kernels.geom import Geom, format_wkt, parse_wkt
from geospark.kernels.ops import point_in_rings
from geospark.kernels.wkb import parse_wkb, write_wkb

coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_subnormal=False).map(lambda v: round(v, 6))


def _coords(ndim, min_k, max_k):
    return st.lists(st.tuples(*[coord] * ndim), min_size=min_k,
                    max_size=max_k)


_DIMS_FLAGS = {"xy": (False, False), "xyz": (True, False),
               "xym": (False, True), "xyzm": (True, True)}


@st.composite
def geoms(draw, ndim=2, dims=None):
    """Random geometry of any type in the given dimensionality —
    XY/XYZ via ``ndim`` (legacy) or any of xy/xyz/xym/xyzm via ``dims``
    (reference pins xym/xyzm at geoarrow_geos_test.cc:485-572)."""
    if dims is None:
        dims = "xyz" if ndim == 3 else "xy"
    has_z, has_m = _DIMS_FLAGS[dims]
    ndim = 2 + has_z + has_m
    t = draw(st.sampled_from([1, 2, 3, 4, 5, 6]))
    if t == 1:
        if draw(st.booleans()):
            return Geom(1, has_z, has_m)
        return Geom(1, has_z, has_m,
                    coords=[draw(st.tuples(*[coord] * ndim))])
    if t == 2:
        pts = draw(_coords(ndim, 0, 6))
        return Geom(2, has_z, has_m, coords=pts if pts else None)

    def ring():
        k = draw(st.integers(min_value=3, max_value=6))
        pts = draw(_coords(ndim, k, k))
        return np.array(pts + [pts[0]])
    if t == 3:
        n = draw(st.integers(min_value=0, max_value=3))
        return Geom(3, has_z, has_m,
                    rings=[ring() for _ in range(n)] or None)
    if t == 4:
        n = draw(st.integers(min_value=0, max_value=4))
        return Geom(4, has_z, has_m, parts=[
            Geom(1, has_z, has_m,
                 coords=[draw(st.tuples(*[coord] * ndim))])
            for _ in range(n)])
    if t == 5:
        n = draw(st.integers(min_value=0, max_value=3))
        return Geom(5, has_z, has_m, parts=[
            Geom(2, has_z, has_m, coords=draw(_coords(ndim, 2, 5)))
            for _ in range(n)])
    n = draw(st.integers(min_value=0, max_value=3))
    return Geom(6, has_z, has_m, parts=[
        Geom(3, has_z, has_m, rings=[ring() for _ in range(
            draw(st.integers(min_value=1, max_value=2)))])
        for _ in range(n)])


@settings(max_examples=150, deadline=None)
@given(st.lists(st.one_of(st.none(), geoms()), max_size=6))
def test_wkb_wkt_roundtrip_property(batch):
    for g in batch:
        if g is None:
            continue
        assert parse_wkb(write_wkb(g)).equals_exact(g)
        assert parse_wkt(format_wkt(g)).equals_exact(g)


@settings(max_examples=60, deadline=None)
@given(st.lists(geoms(), min_size=0, max_size=5),
       st.sampled_from([1, 2, 3, 4, 5, 6]), st.booleans())
def test_native_encoding_roundtrip_property(batch, type_id, interleaved):
    # native encodings need single-type batches: coerce by filtering
    batch = [g for g in batch if g.type_id == type_id]
    from geospark.kernels.garrow import NATIVE_EXTENSIONS
    ext = NATIVE_EXTENSIONS[type_id - 1]
    enc = "geoarrow_interleaved" if interleaved else "geoarrow"
    arr, _ = encode(batch, enc, extension=ext, dims="xy")
    back = decode(arr, f"geoarrow.{ext}")
    assert len(back) == len(batch)
    for g, b in zip(batch, back):
        assert b is not None and g.equals_exact(b)


@settings(max_examples=60, deadline=None)
@given(st.lists(geoms(ndim=3), min_size=1, max_size=4))
def test_z_roundtrip_property(batch):
    for g in batch:
        assert parse_wkb(write_wkb(g)).equals_exact(g)


@pytest.mark.parametrize("dims", ["xym", "xyzm"])
@settings(max_examples=50, deadline=None)
@given(data=st.data())
def test_m_roundtrip_property(dims, data):
    """XYM/XYZM geometries through WKB and WKT (round-1 gap: M carried
    by the kernels but never property-roundtripped)."""
    batch = data.draw(st.lists(geoms(dims=dims), min_size=1, max_size=4))
    for g in batch:
        b = parse_wkb(write_wkb(g))
        assert (b.has_z, b.has_m) == (g.has_z, g.has_m)
        assert b.equals_exact(g)
        w = parse_wkt(format_wkt(g))
        assert (w.has_z, w.has_m) == (g.has_z, g.has_m)
        assert w.equals_exact(g)


@pytest.mark.parametrize("dims", ["xy", "xyz", "xym", "xyzm"])
@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_native_encoding_m_roundtrip_property(dims, data):
    """All four dims through BOTH native coord layouts."""
    from geospark.kernels.garrow import NATIVE_EXTENSIONS
    type_id = data.draw(st.sampled_from([1, 2, 3, 4, 5, 6]))
    batch = [g for g in data.draw(
        st.lists(geoms(dims=dims), min_size=0, max_size=5))
        if g.type_id == type_id]
    ext = NATIVE_EXTENSIONS[type_id - 1]
    for enc in ("geoarrow", "geoarrow_interleaved"):
        arr, _ = encode(batch, enc, extension=ext, dims=dims)
        back = decode(arr, f"geoarrow.{ext}")
        assert len(back) == len(batch)
        for g, b in zip(batch, back):
            assert b is not None and (b.has_z, b.has_m) == \
                (g.has_z, g.has_m) and g.equals_exact(b)


def _crossing_number(px, py, rings):
    """Independent scalar crossing-number implementation (different
    formulation from ops.point_in_rings: edge-direction split instead of
    the single xint comparison)."""
    inside = False
    for ring in rings:
        for i in range(len(ring) - 1):
            x1, y1 = ring[i][0], ring[i][1]
            x2, y2 = ring[i + 1][0], ring[i + 1][1]
            if (y1 <= py < y2) or (y2 <= py < y1):
                t = (py - y1) / (y2 - y1)
                xi = x1 + t * (x2 - x1)
                if px < xi:
                    inside = not inside
    return inside


def _dist_to_segments(px, py, ring):
    d = np.inf
    for i in range(len(ring) - 1):
        ax, ay = ring[i]
        bx, by = ring[i + 1]
        vx, vy = bx - ax, by - ay
        L2 = vx * vx + vy * vy
        t = 0.0 if L2 == 0 else max(
            0.0, min(1.0, ((px - ax) * vx + (py - ay) * vy) / L2))
        qx, qy = ax + t * vx, ay + t * vy
        d = min(d, ((px - qx) ** 2 + (py - qy) ** 2) ** 0.5)
    return d


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=7),
       st.tuples(coord, coord))
def test_ray_cast_matches_independent_impl(ring_pts, pt):
    from hypothesis import assume
    ring = np.array(ring_pts + [ring_pts[0]], dtype=np.float64)
    px, py = float(pt[0]), float(pt[1])
    # exclude points on/near the boundary: the two formulations round
    # the edge-intersection differently there (what matters for the
    # engine is that the NumPy kernel and its SQL twin share the SAME
    # formulation — that identity is exercised by the oracle suite)
    scale = 1.0 + float(np.abs(ring).max()) + abs(px) + abs(py)
    assume(_dist_to_segments(px, py, ring) > 1e-9 * scale)
    got = bool(point_in_rings(np.array([px]), np.array([py]),
                              [ring])[0])
    exp = _crossing_number(px, py, [ring])
    assert got == exp


# ---------------------------------------------------------------------------
# point-WKB fast path == general codec (round-2: mixed SRID/endian rows)
# ---------------------------------------------------------------------------

@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(coord, coord,
                          st.sampled_from(["iso", "ewkb_srid", "be"])),
                min_size=1, max_size=12))
def test_point_fast_path_matches_general_codec(rows):
    """wkb_batch_xy (vectorized fast path + fallback) must agree with
    per-row parse_wkb for every header variant: plain ISO LE, EWKB with
    SRID flag, big-endian."""
    import struct
    import pandas as pd
    from geospark.functions.geometry import wkb_batch_xy

    def make(x, y, kind):
        if kind == "iso":
            return (b"\x01" + struct.pack("<I", 1)
                    + struct.pack("<dd", x, y))
        if kind == "ewkb_srid":
            return (b"\x01" + struct.pack("<I", 1 | 0x20000000)
                    + struct.pack("<I", 4326) + struct.pack("<dd", x, y))
        return (b"\x00" + struct.pack(">I", 1)
                + struct.pack(">dd", x, y))

    bufs = [make(x, y, k) for x, y, k in rows]
    xs, ys, ok = wkb_batch_xy(pd.Series(bufs))
    for i, (x, y, _) in enumerate(rows):
        g = parse_wkb(bufs[i])
        assert ok[i]
        assert xs[i] == g.coords[0, 0] == x
        assert ys[i] == g.coords[0, 1] == y
