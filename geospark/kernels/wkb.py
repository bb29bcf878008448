"""ISO WKB encode/decode kernels.

Two tiers, deliberately:

* **Vectorized point fast path** (`points_to_wkb_buffer`,
  `parse_point_wkb_buffer`) — operates on a packed
  ``(data: uint8[], offsets: int64[])`` pair straight out of a pyarrow
  BinaryArray, zero per-row Python. This is the 10^12-row path: web-page
  geotags are points, so the columns that exist at Common-Crawl scale are
  point columns. Reference analog: MakeGeomFromWKB's slice-per-row loop
  (geoarrow_geos.c:457-486) — ours does one structured-dtype view per
  batch instead of n reader calls.

* **General geometry codec** (`parse_wkb`, `write_wkb`) — handles all 7
  types, Z/M/ZM, EMPTY, nesting. Per-geometry (not per-vertex) Python with
  NumPy bulk coord copies, mirroring the reference's per-feature
  GEOSWKBReader/Writer calls (geoarrow_geos.c:465-484). Used on cold
  paths: the fixture corpus, broadcast-side polygon dims (thousands of
  rows), WKT/debug surface.

Byte order: writes little-endian; reads either (GEOS' reader does too).
EMPTY handling: POINT EMPTY serializes as NaN coordinates (GEOS >= 3.8
convention); zero-length rings/parts encode EMPTY for the rest —
reference parity: empty polygon = zero rings (geoarrow_geos.c:692-694),
empty collection = zero parts (geoarrow_geos.c:742-744).
"""

from __future__ import annotations

import struct

import numpy as np

from .geom import Geom

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def _decode_type(raw: int) -> tuple[int, bool, bool, bool]:
    """raw uint32 -> (type_id 1-7, has_z, has_m, has_srid). Accepts ISO
    (1000/2000/3000 offsets) and EWKB flag bits."""
    has_srid = bool(raw & _EWKB_SRID)
    has_z = bool(raw & _EWKB_Z)
    has_m = bool(raw & _EWKB_M)
    base = raw & 0x1FFFFFFF
    k, t = divmod(base, 1000)
    if t == 0:  # e.g. raw 3000 would split wrong; ISO codes are k*1000+t, t>=1
        k, t = k - 1, 1000
    if k == 1:
        has_z = True
    elif k == 2:
        has_m = True
    elif k == 3:
        has_z = has_m = True
    if not 1 <= t <= 7:
        raise ValueError(f"bad WKB geometry type {raw}")
    return t, has_z, has_m, has_srid


# ---------------------------------------------------------------------------
# general decode
# ---------------------------------------------------------------------------

class _Cur:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0


def _read_geom(c: _Cur) -> Geom:
    bo = c.buf[c.pos]
    c.pos += 1
    le = bo == 1
    pre = "<" if le else ">"
    (raw,) = struct.unpack_from(pre + "I", c.buf, c.pos)
    c.pos += 4
    t, has_z, has_m, has_srid = _decode_type(raw)
    if has_srid:
        c.pos += 4
    nd = 2 + has_z + has_m

    def read_coords(k: int) -> np.ndarray:
        a = np.frombuffer(c.buf, dtype=("<f8" if le else ">f8"),
                          count=k * nd, offset=c.pos)
        c.pos += 8 * k * nd
        return a.reshape(k, nd).astype(np.float64, copy=False)

    def read_u32() -> int:
        (v,) = struct.unpack_from(pre + "I", c.buf, c.pos)
        c.pos += 4
        return v

    if t == 1:
        coords = read_coords(1)
        if np.isnan(coords).all():
            return Geom(1, has_z, has_m)  # POINT EMPTY (NaN convention)
        return Geom(1, has_z, has_m, coords=coords)
    if t == 2:
        return Geom(2, has_z, has_m, coords=read_coords(read_u32()))
    if t == 3:
        nrings = read_u32()
        rings = [read_coords(read_u32()) for _ in range(nrings)]
        return Geom(3, has_z, has_m, rings=rings)
    # multi*/collection: children are full WKB geometries
    nparts = read_u32()
    parts = [_read_geom(c) for _ in range(nparts)]
    return Geom(t, has_z, has_m, parts=parts)


def parse_wkb(buf: bytes | bytearray | memoryview | None) -> Geom | None:
    if buf is None:
        return None
    c = _Cur(bytes(buf))
    g = _read_geom(c)
    return g


# ---------------------------------------------------------------------------
# general encode
# ---------------------------------------------------------------------------

def _write_geom(g: Geom, out: bytearray) -> None:
    out.append(1)  # little-endian
    out += struct.pack("<I", g.iso_code)
    nd = g.ndim
    t = g.type_id
    if t == 1:
        if g.is_empty:
            out += struct.pack(f"<{nd}d", *([float("nan")] * nd))
        else:
            out += g.coords.astype("<f8", copy=False).tobytes()
        return
    if t == 2:
        out += struct.pack("<I", g.coords.shape[0])
        out += g.coords.astype("<f8", copy=False).tobytes()
        return
    if t == 3:
        out += struct.pack("<I", len(g.rings))
        for r in g.rings:
            out += struct.pack("<I", r.shape[0])
            out += r.astype("<f8", copy=False).tobytes()
        return
    out += struct.pack("<I", len(g.parts))
    for p in g.parts:
        _write_geom(p, out)


def write_wkb(g: Geom | None) -> bytes | None:
    if g is None:
        return None
    out = bytearray()
    _write_geom(g, out)
    return bytes(out)


# ---------------------------------------------------------------------------
# vectorized point fast path (hot: billions of rows)
# ---------------------------------------------------------------------------

_POINT_XY_LEN = 21  # 1 byte order + 4 type + 16 coords

_point_dt = np.dtype([("bo", "u1"), ("typ", "<u4"),
                      ("x", "<f8"), ("y", "<f8")])


def points_to_wkb_buffer(x: np.ndarray, y: np.ndarray
                         ) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) float64 arrays -> (data uint8[n*21], offsets int32[n+1]).

    Fully vectorized: one structured-array assignment per batch. Feed the
    result to ``pyarrow.BinaryArray.from_buffers`` (see functions.geometry)
    so no per-row bytes objects are created. Rows where x or y is NaN
    should be masked to null by the caller (validity bitmap) — NaN here
    means POINT EMPTY, which is distinct from null (SURVEY.md §1.3)."""
    n = x.shape[0]
    rec = np.empty(n, dtype=_point_dt)
    rec["bo"] = 1
    rec["typ"] = 1
    rec["x"] = x
    rec["y"] = y
    data = rec.view(np.uint8)
    offsets = np.arange(0, (n + 1) * _POINT_XY_LEN, _POINT_XY_LEN,
                        dtype=np.int32)
    return data, offsets


def parse_point_wkb_buffer(data: np.ndarray, offsets: np.ndarray,
                           validity: np.ndarray | None
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse fast path over a pyarrow BinaryArray's raw buffers.

    Returns (x, y, ok) float64/bool arrays of length n = len(offsets)-1.
    ``ok`` is False for null rows and rows that are not plain
    little-endian XY/XYZ(+)-headed points (caller falls back to the
    general codec for those — the type-homogeneous-grouping strategy of
    SURVEY.md §7.3). XYZ points: x/y still extracted (z dropped here; the
    general path preserves it)."""
    n = offsets.shape[0] - 1
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    ok = np.zeros(n, dtype=bool)
    if n == 0:
        return x, y, ok
    lens = np.diff(offsets)
    cand = lens >= _POINT_XY_LEN
    if validity is not None:
        cand &= validity
    idx = np.nonzero(cand)[0]
    if idx.size == 0:
        return x, y, ok
    starts = offsets[idx].astype(np.int64)
    # header check: little-endian + type code point (ISO 1/1001/2001/3001
    # or EWKB flags)
    bo = data[starts]
    traw = (data[starts + 1].astype(np.uint32)
            | (data[starts + 2].astype(np.uint32) << 8)
            | (data[starts + 3].astype(np.uint32) << 16)
            | (data[starts + 4].astype(np.uint32) << 24))
    base = traw & np.uint32(0x1FFFFFFF)
    # EWKB SRID flag (0x20000000) inserts 4 SRID bytes between the
    # header and the coords — reading bytes 5..21 would consume them as
    # coordinate data. Exclude those rows so they fall back to the
    # general codec (parse_wkb handles SRID correctly).
    is_pt = ((bo == 1) & (base % np.uint32(1000) == 1)
             & ((traw & np.uint32(0x20000000)) == 0))
    idx = idx[is_pt]
    if idx.size == 0:
        return x, y, ok
    starts = starts[is_pt]
    xb = np.empty(idx.size, dtype=np.float64)
    yb = np.empty(idx.size, dtype=np.float64)
    # gather 8-byte windows; vectorized via as_strided-free fancy indexing
    gather = starts[:, None] + np.arange(5, 21, dtype=np.int64)[None, :]
    wins = data[gather]  # (m, 16) uint8
    xb = wins[:, :8].copy().view("<f8").ravel()
    yb = wins[:, 8:].copy().view("<f8").ravel()
    x[idx] = xb
    y[idx] = yb
    ok[idx] = ~(np.isnan(xb) | np.isnan(yb))  # POINT EMPTY -> not ok
    return x, y, ok
