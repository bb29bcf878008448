"""GeoArrow columnar arrays: the four physical encodings of the reference.

Implements the reference's type system (enum GeoArrowGEOSEncoding,
geoarrow_geos.h:61-67) as pyarrow arrays with exact physical layouts:

  wkt                    utf8 (validity, int32 offsets, bytes)
  wkb                    binary (same 3-buffer layout, ISO WKB payload)
  geoarrow (separate)    nested lists over struct<x,y[,z][,m]: double>
                         (GEOARROW_COORD_TYPE_SEPARATE branch,
                          geoarrow_geos.c:550-552, schema 1082-1083)
  geoarrow_interleaved   nested lists over fixed_size_list<double>[ndim]
                         with the child field named by the dims string
                         (geoarrow_geos.c:554-557, schema 1085-1086)

Nesting depth per geometry type mirrors geoarrow_geos.c's offset-level
arithmetic (SURVEY.md §1.2): point 0 levels, linestring/multipoint 1,
polygon/multilinestring 2, multipolygon 3 (geoarrow_geos.c:591, 608-610,
671-673, 816-825). GEOMETRYCOLLECTION has no native layout — the reference
reader returns ENOTSUP (geoarrow_geos.c:827-830); we raise likewise.

Null vs EMPTY: validity is consulted only at the outermost level
("Currently collections are always outer geometries",
geoarrow_geos.c:727); EMPTY is zero rings/parts (geoarrow_geos.c:692-694,
742-744) or NaN coords for points. Extension metadata key
``ARROW:extension:name`` carries ``geoarrow.<type>``
(geoarrow_geos_test.cc:466-482); dims are recoverable by concatenating
coord child field names (geoarrow_geos_test.cc:447-458).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .geom import Geom, format_wkt, parse_wkt
from .wkb import parse_wkb, write_wkb

# encoding names (the user-facing spelling of GeoArrowGEOSEncoding)
ENC_WKT = "wkt"
ENC_WKB = "wkb"
ENC_GEOARROW = "geoarrow"            # separate coords
ENC_GEOARROW_INTERLEAVED = "geoarrow_interleaved"
ALL_ENCODINGS = (ENC_WKT, ENC_WKB, ENC_GEOARROW, ENC_GEOARROW_INTERLEAVED)

NATIVE_EXTENSIONS = ("point", "linestring", "polygon", "multipoint",
                     "multilinestring", "multipolygon")
_TYPE_ID_TO_EXT = {i + 1: n for i, n in enumerate(NATIVE_EXTENSIONS)}
_EXT_TO_TYPE_ID = {n: i + 1 for i, n in enumerate(NATIVE_EXTENSIONS)}

# nesting depth (number of list-offset levels above the coord array)
DEPTH = {"point": 0, "linestring": 1, "multipoint": 1, "polygon": 2,
         "multilinestring": 2, "multipolygon": 3}
# list child field names outer->inner (geoarrow spec, matches geoarrow-c)
LIST_NAMES = {
    "linestring": ["vertices"],
    "multipoint": ["points"],
    "polygon": ["rings", "vertices"],
    "multilinestring": ["linestrings", "vertices"],
    "multipolygon": ["polygons", "rings", "vertices"],
    "point": [],
}

EXT_KEY = b"ARROW:extension:name"


@dataclass
class GeoArrowArray:
    """Decoded columnar geometry batch (NumPy view of the Arrow layout)."""

    extension: str                       # point/.../multipolygon/wkb/wkt
    dims: str = "xy"                     # native encodings only
    length: int = 0
    validity: np.ndarray | None = None   # bool[n]; None = all valid
    offsets: list = field(default_factory=list)  # outer->inner int32[..]
    coords: np.ndarray | None = None     # (ncoord, ndim) float64
    values: list | None = None           # wkb: bytes|None; wkt: str|None

    @property
    def ndim(self) -> int:
        return len(self.dims)

    @property
    def extension_name(self) -> str:
        return f"geoarrow.{self.extension}"


# ---------------------------------------------------------------------------
# Geom list -> GeoArrowArray
# ---------------------------------------------------------------------------

def _dims_of(has_z: bool, has_m: bool) -> str:
    return {(False, False): "xy", (True, False): "xyz",
            (False, True): "xym", (True, True): "xyzm"}[(has_z, has_m)]


def geoms_to_geoarrow(geoms: list[Geom | None], extension: str,
                      dims: str | None = None) -> GeoArrowArray:
    """Encode a homogeneous batch into one of the four encodings.

    ``extension`` in NATIVE_EXTENSIONS | 'wkb' | 'wkt'. For native
    encodings the batch must be single-type (simple type may appear where
    its multi is requested only via explicit promotion by the caller);
    nulls allowed anywhere; EMPTY encodes as zero-length / NaN point."""
    n = len(geoms)
    if extension == ENC_WKB:
        return GeoArrowArray(ENC_WKB, length=n,
                             values=[write_wkb(g) for g in geoms])
    if extension == ENC_WKT:
        return GeoArrowArray(ENC_WKT, length=n,
                             values=[format_wkt(g) for g in geoms])
    if extension not in NATIVE_EXTENSIONS:
        raise ValueError(f"unknown extension {extension!r}")

    if dims is None:
        ds = {g.dims for g in geoms if g is not None}
        dims = ds.pop() if len(ds) == 1 else ("xy" if not ds else None)
        if dims is None:
            raise ValueError("mixed dimensions in batch; pass dims=")
    nd = len(dims)
    type_id = _EXT_TO_TYPE_ID[extension]
    depth = DEPTH[extension]
    has_z, has_m = "z" in dims, "m" in dims

    validity = np.ones(n, dtype=bool)
    coords_parts: list[np.ndarray] = []
    offs = [[0] for _ in range(depth)]
    ncoord = 0

    def push_coords(a: np.ndarray) -> int:
        nonlocal ncoord
        if a.shape[0] == 0:
            a = np.empty((0, nd))
        elif a.shape[1] > nd:
            # builder coerces geometry coords to the schema's dims,
            # dropping extras (GeoArrowBuilder behavior under an XY schema
            # fed XYZ input — exercised by the corpus' Z-EMPTY-in-XY rows)
            a = a[:, :nd]
        elif a.shape[1] < nd:
            raise ValueError(
                f"geometry dims {a.shape[1]} < batch dims {nd}")
        coords_parts.append(a)
        ncoord += a.shape[0]
        return a.shape[0]

    for i, g in enumerate(geoms):
        if g is None:
            validity[i] = False
            g = Geom(type_id, has_z, has_m)  # encode as EMPTY under null
        if g.type_id != type_id:
            raise ValueError(
                f"geometry type {g.type_id} in batch typed {extension}")
        if extension == "point":
            if g.is_empty:
                push_coords(np.full((1, nd), np.nan))
            else:
                push_coords(g.coords)
        elif extension == "linestring":
            push_coords(g.coords)
            offs[0].append(ncoord)
        elif extension == "multipoint":
            for p in g.parts:
                push_coords(np.full((1, nd), np.nan) if p.is_empty
                            else p.coords)
            offs[0].append(ncoord)
        elif extension == "polygon":
            for r in g.rings:
                push_coords(r)
                offs[1].append(ncoord)
            offs[0].append(len(offs[1]) - 1)
        elif extension == "multilinestring":
            for p in g.parts:
                push_coords(p.coords)
                offs[1].append(ncoord)
            offs[0].append(len(offs[1]) - 1)
        elif extension == "multipolygon":
            for p in g.parts:
                for r in p.rings:
                    push_coords(r)
                    offs[2].append(ncoord)
                offs[1].append(len(offs[2]) - 1)
            offs[0].append(len(offs[1]) - 1)

    coords = (np.concatenate(coords_parts, axis=0) if coords_parts
              else np.empty((0, nd)))
    return GeoArrowArray(
        extension, dims=dims, length=n,
        validity=None if validity.all() else validity,
        offsets=[np.asarray(o, dtype=np.int32) for o in offs],
        coords=coords)


# ---------------------------------------------------------------------------
# GeoArrowArray -> Geom list
# ---------------------------------------------------------------------------

def geoarrow_to_geoms(arr: GeoArrowArray) -> list[Geom | None]:
    if arr.extension == ENC_WKB:
        return [parse_wkb(v) for v in arr.values]
    if arr.extension == ENC_WKT:
        return [parse_wkt(v) for v in arr.values]
    ext, dims = arr.extension, arr.dims
    has_z, has_m = "z" in dims, "m" in dims
    type_id = _EXT_TO_TYPE_ID[ext]
    out: list[Geom | None] = []
    C, O = arr.coords, arr.offsets
    for i in range(arr.length):
        if arr.validity is not None and not arr.validity[i]:
            out.append(None)
            continue
        if ext == "point":
            c = C[i:i + 1]
            g = (Geom(1, has_z, has_m) if np.isnan(c).all()
                 else Geom(1, has_z, has_m, coords=c))
        elif ext == "linestring":
            g = Geom(2, has_z, has_m, coords=C[O[0][i]:O[0][i + 1]])
        elif ext == "multipoint":
            pts = [Geom(1, has_z, has_m) if np.isnan(C[j:j + 1]).all()
                   else Geom(1, has_z, has_m, coords=C[j:j + 1])
                   for j in range(O[0][i], O[0][i + 1])]
            g = Geom(4, has_z, has_m, parts=pts)
        elif ext == "polygon":
            rings = [C[O[1][r]:O[1][r + 1]]
                     for r in range(O[0][i], O[0][i + 1])]
            g = Geom(3, has_z, has_m, rings=rings)
        elif ext == "multilinestring":
            parts = [Geom(2, has_z, has_m, coords=C[O[1][j]:O[1][j + 1]])
                     for j in range(O[0][i], O[0][i + 1])]
            g = Geom(5, has_z, has_m, parts=parts)
        elif ext == "multipolygon":
            parts = []
            for p in range(O[0][i], O[0][i + 1]):
                rings = [C[O[2][r]:O[2][r + 1]]
                         for r in range(O[1][p], O[1][p + 1])]
                parts.append(Geom(3, has_z, has_m, rings=rings))
            g = Geom(6, has_z, has_m, parts=parts)
        else:  # pragma: no cover
            raise ValueError(ext)
        out.append(g)
    return out


# ---------------------------------------------------------------------------
# pyarrow physical layout
# ---------------------------------------------------------------------------

def _validity_buffer(validity: np.ndarray | None):
    if validity is None:
        return None
    return pa.py_buffer(np.packbits(validity, bitorder="little").tobytes())


def _coord_array_separate(coords: np.ndarray, dims: str) -> pa.Array:
    fields = [pa.field(d, pa.float64(), nullable=False) for d in dims]
    children = [pa.array(np.ascontiguousarray(coords[:, k]),
                         type=pa.float64())
                for k in range(len(dims))]
    return pa.StructArray.from_arrays(children, fields=fields)


def _coord_array_interleaved(coords: np.ndarray, dims: str) -> pa.Array:
    nd = len(dims)
    child = pa.array(np.ascontiguousarray(coords).ravel(),
                     type=pa.float64())
    typ = pa.list_(pa.field(dims, pa.float64(), nullable=False), nd)
    return pa.Array.from_buffers(typ, coords.shape[0], [None],
                                 children=[child])


def _list_array(offsets: np.ndarray, child: pa.Array, name: str,
                validity: np.ndarray | None = None) -> pa.Array:
    typ = pa.list_(pa.field(name, child.type, nullable=False))
    bufs = [_validity_buffer(validity),
            pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int32)
                         .tobytes())]
    return pa.Array.from_buffers(typ, len(offsets) - 1, bufs,
                                 children=[child])


def to_pyarrow(arr: GeoArrowArray,
               coord_type: str = "separate") -> tuple[pa.Array, pa.Field]:
    """GeoArrowArray -> (pyarrow array, field with extension metadata).

    coord_type: 'separate' | 'interleaved' (ignored for wkb/wkt).
    Reference analog: GeoArrowGEOSMakeSchema + builder Finish
    (geoarrow_geos.c:1068-1100, 115-127)."""
    meta = {EXT_KEY: arr.extension_name.encode()}
    if arr.extension == ENC_WKB:
        a = pa.array(arr.values, type=pa.binary())
        return a, pa.field("geometry", a.type, metadata=meta)
    if arr.extension == ENC_WKT:
        a = pa.array(arr.values, type=pa.utf8())
        return a, pa.field("geometry", a.type, metadata=meta)

    coords = arr.coords if arr.coords is not None else np.empty((0, arr.ndim))
    if coord_type == "separate":
        inner: pa.Array = _coord_array_separate(coords, arr.dims)
    elif coord_type == "interleaved":
        inner = _coord_array_interleaved(coords, arr.dims)
    else:
        raise ValueError(coord_type)

    names = LIST_NAMES[arr.extension]
    depth = DEPTH[arr.extension]
    a = inner
    # build inner->outer; validity only at outermost level
    for lvl in range(depth - 1, -1, -1):
        is_outer = lvl == 0
        a = _list_array(arr.offsets[lvl], a, names[lvl],
                        validity=arr.validity if is_outer else None)
    if depth == 0 and arr.validity is not None:
        # point: rebuild coord array with validity at the struct/fsl level
        if coord_type == "separate":
            fields = [pa.field(d, pa.float64(), nullable=False)
                      for d in arr.dims]
            typ = pa.struct(fields)
            children = [pa.array(np.ascontiguousarray(coords[:, k]))
                        for k in range(arr.ndim)]
            a = pa.Array.from_buffers(typ, arr.length,
                                      [_validity_buffer(arr.validity)],
                                      children=children)
        else:
            child = pa.array(np.ascontiguousarray(coords).ravel())
            typ = pa.list_(pa.field(arr.dims, pa.float64(),
                                    nullable=False), arr.ndim)
            a = pa.Array.from_buffers(typ, arr.length,
                                      [_validity_buffer(arr.validity)],
                                      children=[child])
    return a, pa.field("geometry", a.type, metadata=meta)


def _dims_from_coord_type(t: pa.DataType) -> str:
    if pa.types.is_struct(t):
        return "".join(t.field(i).name for i in range(t.num_fields))
    if pa.types.is_fixed_size_list(t):
        return t.value_field.name
    raise ValueError(f"not a coord type: {t}")


def from_pyarrow(a: pa.Array, ext_name: str | None = None) -> GeoArrowArray:
    """pyarrow array (+ extension name, e.g. from field metadata) ->
    GeoArrowArray. Reference analog: GeoArrowGEOSArrayReaderRead dispatch
    (geoarrow_geos.c:766-835)."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if pa.types.is_binary(a.type) or pa.types.is_large_binary(a.type):
        return GeoArrowArray(ENC_WKB, length=len(a), values=a.to_pylist())
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
        return GeoArrowArray(ENC_WKT, length=len(a), values=a.to_pylist())

    if ext_name is None:
        raise ValueError("native layout requires extension name")
    ext = ext_name.removeprefix("geoarrow.")
    if ext == "geometrycollection" or ext not in NATIVE_EXTENSIONS:
        # reference: native GC decode is ENOTSUP (geoarrow_geos.c:827-830)
        raise NotImplementedError(
            f"native decode unsupported for {ext_name} (reference parity: "
            "geoarrow_geos.c:827-830)")
    depth = DEPTH[ext]
    validity = None
    if a.null_count > 0:
        validity = ~np.asarray(a.is_null())
    offsets = []
    cur = a
    for _ in range(depth):
        if not pa.types.is_list(cur.type):
            raise ValueError(f"layout mismatch for {ext_name}: {a.type}")
        offsets.append(np.asarray(cur.offsets, dtype=np.int32))
        cur = cur.values
    dims = _dims_from_coord_type(cur.type)
    nd = len(dims)
    if pa.types.is_struct(cur.type):
        cols = [np.asarray(cur.field(i), dtype=np.float64)
                for i in range(nd)]
        coords = np.column_stack(cols) if cols else np.empty((0, nd))
    else:
        flat = np.asarray(cur.values, dtype=np.float64)
        coords = flat.reshape(-1, nd)
    return GeoArrowArray(ext, dims=dims, length=len(a), validity=validity,
                         offsets=offsets, coords=coords)


# ---------------------------------------------------------------------------
# encoding roundtrip convenience (the test surface)
# ---------------------------------------------------------------------------

def encode(geoms: list[Geom | None], encoding: str,
           extension: str | None = None,
           dims: str | None = None) -> tuple[pa.Array, pa.Field]:
    """Encode geometries under one of the four reference encodings."""
    if encoding == ENC_WKB:
        arr = geoms_to_geoarrow(geoms, ENC_WKB)
        return to_pyarrow(arr)
    if encoding == ENC_WKT:
        arr = geoms_to_geoarrow(geoms, ENC_WKT)
        return to_pyarrow(arr)
    if encoding in (ENC_GEOARROW, ENC_GEOARROW_INTERLEAVED):
        if extension is None:
            tids = {g.type_id for g in geoms if g is not None}
            if len(tids) != 1:
                raise ValueError("native encoding needs single-type batch")
            extension = _TYPE_ID_TO_EXT[tids.pop()]
        arr = geoms_to_geoarrow(geoms, extension, dims=dims)
        ct = "separate" if encoding == ENC_GEOARROW else "interleaved"
        return to_pyarrow(arr, coord_type=ct)
    raise ValueError(f"unknown encoding {encoding!r}")


def decode(a: pa.Array, ext_name: str | None = None) -> list[Geom | None]:
    return geoarrow_to_geoms(from_pyarrow(a, ext_name))
