"""Internal geometry model + WKT parse/format.

The reference's geometry unit is a ``GEOSGeometry*``; ours is :class:`Geom`,
a tiny NumPy-backed struct (coords live in float64 arrays, never Python
lists of floats). ``Geom`` objects appear only on *cold* paths — the
fixture corpus, zone/polygon dimension tables (thousands of rows,
broadcast-side), and debugging. The hot path (billions of points) never
materializes ``Geom``: see ``wkb.points_to_wkb`` / ``wkb.wkb_to_points``
and the cell/ray-cast kernels, which are fully vectorized.

Semantics contract (reference parity):
  * null vs EMPTY are distinct everywhere — a null feature maps to
    ``None`` (reference: NULL GEOSGeometry*, geoarrow_geos.c:466-469 /
    null_feat visitor event geoarrow_geos.c:170-173); EMPTY round-trips
    as a typed geometry with zero coords/rings/parts
    (geoarrow_geos.c:692-694, 742-744).
  * dimensions: XY / XYZ / XYM / XYZM (geoarrow_geos.c:532-545). The
    reference's GEOS side only detects 2-D/3-D ("Not sure how M
    coordinates work in GEOS yet", geoarrow_geos.c:153); our model carries
    M fully since the Arrow side of the reference supports it.
  * two type-code conventions coexist in the reference (SURVEY.md §1.3):
    ISO (``iso_code``: Z=+1000, M=+2000, ZM=+3000) used by
    GeoArrowGEOSMakeSchema, and the calculator convention
    (``calc_code``: 0 for XY/empty/null, 2000+t for XYZ,
    geoarrow_geos.h:125-170) used by the schema calculator.
"""

from __future__ import annotations

import numpy as np

GEOM_TYPES = {
    1: "POINT",
    2: "LINESTRING",
    3: "POLYGON",
    4: "MULTIPOINT",
    5: "MULTILINESTRING",
    6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}
TYPE_IDS = {v: k for k, v in GEOM_TYPES.items()}
MULTI_OF = {1: 4, 2: 5, 3: 6}
SIMPLE_OF = {4: 1, 5: 2, 6: 3}

DIMS_XY, DIMS_XYZ, DIMS_XYM, DIMS_XYZM = "xy", "xyz", "xym", "xyzm"


class Geom:
    """One geometry. coords is float64 (k, ndim); ndim = 2+has_z+has_m.

    point:       coords shape (0|1, ndim)  — (0, ndim) means EMPTY
    linestring:  coords shape (k, ndim)
    polygon:     rings = [coords (k_i, ndim), ...]; [] means EMPTY
    multi*/collection: parts = [Geom, ...]; [] means EMPTY
    """

    __slots__ = ("type_id", "has_z", "has_m", "coords", "rings", "parts")

    def __init__(self, type_id, has_z=False, has_m=False, coords=None,
                 rings=None, parts=None):
        self.type_id = int(type_id)
        self.has_z = bool(has_z)
        self.has_m = bool(has_m)
        nd = 2 + self.has_z + self.has_m
        self.coords = (np.asarray(coords, dtype=np.float64).reshape(-1, nd)
                       if coords is not None else np.empty((0, nd)))
        self.rings = ([np.asarray(r, dtype=np.float64).reshape(-1, nd)
                       for r in rings] if rings is not None else [])
        self.parts = list(parts) if parts is not None else []

    # -- type codes -------------------------------------------------------
    @property
    def ndim(self) -> int:
        return 2 + self.has_z + self.has_m

    @property
    def dims(self) -> str:
        return {(False, False): DIMS_XY, (True, False): DIMS_XYZ,
                (False, True): DIMS_XYM, (True, True): DIMS_XYZM}[
                    (self.has_z, self.has_m)]

    @property
    def iso_code(self) -> int:
        """ISO WKB type code: Z=+1000, M=+2000, ZM=+3000."""
        return self.type_id + 1000 * self.has_z + 2000 * self.has_m

    @property
    def is_empty(self) -> bool:
        if self.type_id in (1, 2):
            return self.coords.shape[0] == 0
        if self.type_id == 3:
            return len(self.rings) == 0
        return len(self.parts) == 0

    def num_coordinates(self) -> int:
        if self.type_id in (1, 2):
            return self.coords.shape[0]
        if self.type_id == 3:
            return sum(r.shape[0] for r in self.rings)
        return sum(p.num_coordinates() for p in self.parts)

    def calc_code(self) -> int:
        """Calculator-convention code (geoarrow_geos.h:125-170): 0 for
        empty or 2-D; 2000+type for XYZ. Extended per the reference's
        Arrow-side test inputs: XYM -> 3000+t, XYZM -> 4000+t."""
        if self.num_coordinates() == 0:
            return 0
        if self.has_z and self.has_m:
            return 4000 + self.type_id
        if self.has_m:
            return 3000 + self.type_id
        if self.has_z:
            return 2000 + self.type_id
        return self.type_id

    # -- equality (tolerance-0, mirrors GEOSEqualsExact_r with tol=0,
    #    geoarrow_geos_test.cc:161-163) --------------------------------
    def equals_exact(self, other: "Geom") -> bool:
        if other is None or self.type_id != other.type_id:
            return False
        if self.is_empty and other.is_empty:
            # GEOS EqualsExact compares coordinates only: two EMPTYs of the
            # same type are equal regardless of declared dims (the corpus
            # roundtrips 'LINESTRING Z EMPTY' through an XY schema,
            # geoarrow_geos_test.cc:100,203)
            return True
        if self.has_z != other.has_z or self.has_m != other.has_m:
            return False
        if self.type_id in (1, 2):
            return (self.coords.shape == other.coords.shape
                    and bool(np.array_equal(self.coords, other.coords,
                                            equal_nan=True)))
        if self.type_id == 3:
            return (len(self.rings) == len(other.rings)
                    and all(a.shape == b.shape
                            and bool(np.array_equal(a, b, equal_nan=True))
                            for a, b in zip(self.rings, other.rings)))
        return (len(self.parts) == len(other.parts)
                and all(a.equals_exact(b)
                        for a, b in zip(self.parts, other.parts)))

    def __repr__(self):
        return f"Geom<{format_wkt(self)}>"


# ---------------------------------------------------------------------------
# WKT formatting
# ---------------------------------------------------------------------------

def _fmt_num(v: float) -> str:
    # non-finite first: int(inf) would raise, and this pins one policy
    # ('nan'/'inf'/'-inf') shared with the vectorized writer's
    # _format_coord_array so fast-path and fallback rows format
    # identically (ADVICE r3)
    if not np.isfinite(v):
        return np.format_float_positional(v, trim="-")
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return np.format_float_positional(v, trim="-")


def _fmt_coords(coords: np.ndarray) -> str:
    return ", ".join(" ".join(_fmt_num(c) for c in row) for row in coords)


def _dims_tag(g: Geom) -> str:
    if g.has_z and g.has_m:
        return " ZM"
    if g.has_z:
        return " Z"
    if g.has_m:
        return " M"
    return ""


def format_wkt(g: Geom | None) -> str | None:
    """Geometry -> WKT. Reference analog: GeoArrowWKTWriter via the visitor
    (geoarrow_geos.c:28-62 dispatch). Null -> None."""
    if g is None:
        return None
    head = GEOM_TYPES[g.type_id] + _dims_tag(g)
    if g.is_empty:
        return f"{head} EMPTY"
    t = g.type_id
    if t == 1:
        return f"{head} ({_fmt_coords(g.coords)})"
    if t == 2:
        return f"{head} ({_fmt_coords(g.coords)})"
    if t == 3:
        body = ", ".join(f"({_fmt_coords(r)})" for r in g.rings)
        return f"{head} ({body})"
    if t == 4:
        body = ", ".join(
            "EMPTY" if p.is_empty else f"({_fmt_coords(p.coords)})"
            for p in g.parts)
        return f"{head} ({body})"
    if t == 5:
        body = ", ".join(
            "EMPTY" if p.is_empty else f"({_fmt_coords(p.coords)})"
            for p in g.parts)
        return f"{head} ({body})"
    if t == 6:
        body = ", ".join(
            "EMPTY" if p.is_empty else
            "(" + ", ".join(f"({_fmt_coords(r)})" for r in p.rings) + ")"
            for p in g.parts)
        return f"{head} ({body})"
    if t == 7:
        body = ", ".join(format_wkt(p) for p in g.parts)
        return f"{head} ({body})"
    raise ValueError(f"unknown type_id {t}")


# ---------------------------------------------------------------------------
# WKT parsing (cold path: fixtures, zone tables, debugging)
# ---------------------------------------------------------------------------

def _tokenize(wkt: str) -> list[str]:
    out, i, n = [], 0, len(wkt)
    while i < n:
        c = wkt[i]
        if c in "(),":
            out.append(c)
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not wkt[j].isspace() and wkt[j] not in "(),":
                j += 1
            out.append(wkt[i:j])
            i = j
    return out


class _Toks:
    def __init__(self, toks):
        self.t = toks
        self.i = 0

    def peek(self):
        return self.t[self.i] if self.i < len(self.t) else None

    def next(self):
        v = self.peek()
        if v is None:
            raise ValueError("unexpected end of WKT")
        self.i += 1
        return v

    def expect(self, tok):
        v = self.next()
        if v != tok:
            raise ValueError(f"expected {tok!r}, got {v!r}")


def _parse_coord_seq(tk: _Toks, ndim: int) -> np.ndarray:
    tk.expect("(")
    rows = []
    while True:
        row = []
        while tk.peek() not in (",", ")"):
            row.append(float(tk.next()))
        if len(row) != ndim:
            raise ValueError(f"coord has {len(row)} values, expected {ndim}")
        rows.append(row)
        if tk.next() == ")":
            break
    return np.array(rows, dtype=np.float64)


def _parse_body(tk: _Toks, type_id: int, has_z: bool, has_m: bool) -> Geom:
    ndim = 2 + has_z + has_m
    if tk.peek() == "EMPTY":
        tk.next()
        return Geom(type_id, has_z, has_m)
    t = type_id
    if t == 1:
        return Geom(1, has_z, has_m, coords=_parse_coord_seq(tk, ndim))
    if t == 2:
        return Geom(2, has_z, has_m, coords=_parse_coord_seq(tk, ndim))
    if t == 3:
        tk.expect("(")
        rings = []
        while True:
            rings.append(_parse_coord_seq(tk, ndim))
            if tk.next() == ")":
                break
        return Geom(3, has_z, has_m, rings=rings)
    if t in (4, 5):
        child = 1 if t == 4 else 2
        tk.expect("(")
        parts = []
        while True:
            if tk.peek() == "EMPTY":
                tk.next()
                parts.append(Geom(child, has_z, has_m))
            elif t == 4 and tk.peek() != "(":
                # MULTIPOINT (30 10, 40 30) — unparenthesized points
                row = [float(tk.next()) for _ in range(ndim)]
                parts.append(Geom(1, has_z, has_m, coords=[row]))
            else:
                parts.append(Geom(child, has_z, has_m,
                                  coords=_parse_coord_seq(tk, ndim)))
            if tk.next() == ")":
                break
        return Geom(t, has_z, has_m, parts=parts)
    if t == 6:
        tk.expect("(")
        parts = []
        while True:
            if tk.peek() == "EMPTY":
                tk.next()
                parts.append(Geom(3, has_z, has_m))
            else:
                tk.expect("(")
                rings = []
                while True:
                    rings.append(_parse_coord_seq(tk, ndim))
                    if tk.next() == ")":
                        break
                parts.append(Geom(3, has_z, has_m, rings=rings))
            if tk.next() == ")":
                break
        return Geom(6, has_z, has_m, parts=parts)
    if t == 7:
        tk.expect("(")
        parts = []
        while True:
            parts.append(_parse_geom(tk))
            if tk.next() == ")":
                break
        return Geom(7, has_z, has_m, parts=parts)
    raise ValueError(f"unknown type_id {t}")


def _parse_geom(tk: _Toks) -> Geom:
    name = tk.next().upper()
    if name not in TYPE_IDS:
        raise ValueError(f"unknown geometry type {name!r}")
    has_z = has_m = False
    if tk.peek() in ("Z", "M", "ZM", "z", "m", "zm"):
        tag = tk.next().upper()
        has_z = "Z" in tag
        has_m = "M" in tag
    return _parse_body(tk, TYPE_IDS[name], has_z, has_m)


def parse_wkt(wkt: str | None) -> Geom | None:
    """WKT -> Geom. '' or None -> None (null geometry; FIXTURES.md
    convention, geoarrow_geos_test.cc:88)."""
    if wkt is None or wkt == "":
        return None
    tk = _Toks(_tokenize(wkt))
    g = _parse_geom(tk)
    if tk.peek() is not None:
        raise ValueError(f"trailing tokens in WKT: {tk.t[tk.i:]}")
    return g
