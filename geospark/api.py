"""Facade mirroring the reference's C++ convenience API
(geoarrow_geos.hpp:71-207): ArrayBuilder / ArrayReader /
SchemaCalculator become GeoBatchEncoder / GeoBatchDecoder /
SchemaInferrer, operating on pyarrow batches (driver/executor-local) —
the DataFrame-scale equivalents live in functions.encoding.

The reference's ``InitFromEncoding`` convenience (make schema -> init
from schema, geoarrow_geos.hpp:93-106) corresponds to constructing
these with (encoding, extension, dims).
"""

from __future__ import annotations

import pyarrow as pa

from .kernels import garrow
from .kernels.geom import Geom
from .kernels.schema import SchemaCalculator


class GeoBatchEncoder:
    """Geometries -> Arrow array under one of the four encodings
    (reference: GeoArrowGEOSArrayBuilder, geoarrow_geos.c:28-127)."""

    def __init__(self, encoding: str, extension: str | None = None,
                 dims: str | None = None):
        if encoding not in garrow.ALL_ENCODINGS:
            raise ValueError(f"EINVAL: unknown encoding {encoding!r}")
        self.encoding = encoding
        self.extension = extension
        self.dims = dims

    def encode(self, geoms: list[Geom | None]) -> tuple[pa.Array, pa.Field]:
        return garrow.encode(geoms, self.encoding,
                             extension=self.extension, dims=self.dims)


class GeoBatchDecoder:
    """Arrow array -> geometries (reference: GeoArrowGEOSArrayReader,
    geoarrow_geos.c:433-859). Extension name comes from field metadata
    or the constructor."""

    def __init__(self, extension_name: str | None = None):
        self.extension_name = extension_name

    def decode(self, arr: pa.Array,
               field: pa.Field | None = None) -> list[Geom | None]:
        name = self.extension_name
        if name is None and field is not None and field.metadata:
            raw = field.metadata.get(b"ARROW:extension:name")
            name = raw.decode() if raw else None
        return garrow.decode(arr, name)


class SchemaInferrer:
    """Streaming type-code fold -> target schema (reference:
    GeoArrowGEOSSchemaCalculator, geoarrow_geos.c:861-1066)."""

    def __init__(self):
        self._calc = SchemaCalculator()

    def ingest(self, codes) -> "SchemaInferrer":
        self._calc.ingest(codes)
        return self

    def ingest_geoms(self, geoms) -> "SchemaInferrer":
        self._calc.ingest(0 if g is None else g.calc_code()
                          for g in geoms)
        return self

    def finish(self, encoding: str) -> tuple[str, str | None]:
        return self._calc.finish(encoding)
