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


class PolygonBatch:
    """Ragged columnar view of a batch of decoded polygons (SURVEY §7.3
    type-homogeneous grouping, realized): all rings of all polygons in
    the batch live in ONE flat (x, y) pair of float64 arrays, with
    ring->polygon and coord->ring index arrays — the shape NumPy batch
    kernels (shoelace area/centroid, ray casts) consume directly with
    reduceat/add.at, zero per-row Python."""

    __slots__ = ("ok", "poly_of_ring", "ring_ordinal", "ring_row_start",
                 "ring_rows", "xs", "ys")

    def __init__(self, ok, poly_of_ring, ring_ordinal, ring_row_start,
                 ring_rows, xs, ys):
        self.ok = ok                        # bool[n] decoded here
        self.poly_of_ring = poly_of_ring    # int64[R] geometry index
        self.ring_ordinal = ring_ordinal    # int64[R] 0=exterior
        self.ring_row_start = ring_row_start  # int64[R] into xs/ys
        self.ring_rows = ring_rows          # int64[R] rows per ring
        self.xs = xs                        # float64[C]
        self.ys = ys                        # float64[C]


def parse_polygon_wkb_buffer(data: np.ndarray, offsets: np.ndarray,
                             validity: np.ndarray | None) -> PolygonBatch:
    """Vectorized batch decode of little-endian POLYGON WKBs straight
    from pyarrow Binary buffers.

    Per-batch work is O(max_rings_per_polygon) vectorized passes (the
    ring headers of ring ordinal r across ALL polygons are read in one
    gather), then one flat coordinate gather — no per-geometry Python.
    Rows that are not LE polygons (points, multis, big-endian, or any
    row failing a bounds sanity check) come back ``ok=False`` and the
    caller falls back to the general per-geometry codec. EMPTY
    polygons (zero rings) decode here with ok=True and no rings.
    EWKB-SRID headers are handled (the 4 SRID bytes are skipped)."""
    n = offsets.shape[0] - 1
    ok = np.zeros(n, dtype=bool)
    empty = (np.empty(0, dtype=np.int64),) * 4
    none = PolygonBatch(ok, *empty, np.empty(0), np.empty(0))
    if n == 0:
        return none
    offsets = offsets.astype(np.int64, copy=False)
    lens = np.diff(offsets)
    cand = lens >= 9
    if validity is not None:
        cand &= validity
    starts = np.where(cand, offsets[:-1], 0)
    bo_ok = np.zeros(n, dtype=bool)
    bo_ok[cand] = data[starts[cand]] == 1
    cand &= bo_ok
    if not cand.any():
        return none
    si = starts
    traw = np.zeros(n, dtype=np.uint32)
    ci = np.nonzero(cand)[0]
    traw[ci] = (data[si[ci] + 1].astype(np.uint32)
                | (data[si[ci] + 2].astype(np.uint32) << 8)
                | (data[si[ci] + 3].astype(np.uint32) << 16)
                | (data[si[ci] + 4].astype(np.uint32) << 24))
    base = traw & np.uint32(0x1FFFFFFF)
    is_poly = cand & (base % np.uint32(1000) == 3)
    if not is_poly.any():
        return none
    k = base // np.uint32(1000)
    has_z = (k == 1) | (k == 3) | ((traw & np.uint32(_EWKB_Z)) != 0)
    has_m = (k == 2) | (k == 3) | ((traw & np.uint32(_EWKB_M)) != 0)
    nd = 2 + has_z.astype(np.int64) + has_m.astype(np.int64)
    srid = ((traw & np.uint32(_EWKB_SRID)) != 0).astype(np.int64) * 4

    def read_u32(pos: np.ndarray) -> np.ndarray:
        return (data[pos].astype(np.int64)
                | (data[pos + 1].astype(np.int64) << 8)
                | (data[pos + 2].astype(np.int64) << 16)
                | (data[pos + 3].astype(np.int64) << 24))

    end = offsets[1:]
    cur = si + 5 + srid
    live = is_poly & (cur + 4 <= end)
    nrings = np.zeros(n, dtype=np.int64)
    nrings[live] = read_u32(cur[live])
    # sanity: a ring count beyond what the byte length could hold marks
    # the row malformed -> fallback path (which raises, as parse_wkb
    # does today)
    sane = live & (nrings <= lens // 4)
    ok_rows = sane.copy()
    cur = cur + 4
    ring_poly: list[np.ndarray] = []
    ring_ord: list[np.ndarray] = []
    ring_cnt: list[np.ndarray] = []
    ring_cpos: list[np.ndarray] = []
    active = sane & (nrings > 0)
    r = 0
    max_r = int(nrings[sane].max()) if sane.any() else 0
    while active.any() and r < max_r:
        ai = np.nonzero(active)[0]
        bounds_ok = cur[ai] + 4 <= end[ai]
        cnt = np.zeros(ai.size, dtype=np.int64)
        cnt[bounds_ok] = read_u32(cur[ai[bounds_ok]])
        nbytes = 4 + cnt * nd[ai] * 8
        fits = bounds_ok & (cur[ai] + nbytes <= end[ai])
        bad = ai[~fits]
        ok_rows[bad] = False
        active[bad] = False
        good = ai[fits]
        ring_poly.append(good)
        ring_ord.append(np.full(good.size, r, dtype=np.int64))
        ring_cnt.append(cnt[fits])
        ring_cpos.append(cur[good] + 4)
        cur[good] = cur[good] + nbytes[fits]
        r += 1
        done = good[nrings[good] <= r]
        active[done] = False
    ok[:] = ok_rows
    # drop rings that belong to rows later marked not-ok (a row can
    # fail at ring j after rings < j were already collected)
    if ring_poly:
        rp = np.concatenate(ring_poly)
        ro = np.concatenate(ring_ord)
        rc = np.concatenate(ring_cnt)
        cp = np.concatenate(ring_cpos)
        keep = ok[rp]
        rp, ro, rc, cp = rp[keep], ro[keep], rc[keep], cp[keep]
        # stable order: group rings by polygon, exterior first
        order = np.lexsort((ro, rp))
        rp, ro, rc, cp = rp[order], ro[order], rc[order], cp[order]
    else:
        rp = ro = rc = cp = np.empty(0, dtype=np.int64)
    total = int(rc.sum())
    if total:
        row_ring = np.repeat(np.arange(rc.size, dtype=np.int64), rc)
        excl = np.concatenate(([0], np.cumsum(rc)[:-1]))
        within = np.arange(total, dtype=np.int64) - excl[row_ring]
        nd8 = nd[rp] * 8
        xpos = cp[row_ring] + within * nd8[row_ring]
        xs = data[xpos[:, None]
                  + np.arange(8, dtype=np.int64)[None, :]] \
            .copy().view("<f8").ravel()
        ys = data[(xpos + 8)[:, None]
                  + np.arange(8, dtype=np.int64)[None, :]] \
            .copy().view("<f8").ravel()
        ring_row_start = excl
    else:
        xs = ys = np.empty(0)
        ring_row_start = np.empty(0, dtype=np.int64)
    return PolygonBatch(ok, rp, ro, ring_row_start, rc, xs, ys)


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
