"""geospark — a from-scratch PySpark-native spatial-join + tiling engine.

Built against the behavior of geoarrow/geoarrow-c-geos (reference at
/root/reference, 4 files, ~2.2k LoC): a batch-oriented geometry
encoding/conversion library between GeoArrow-encoded Arrow columnar arrays
and geometry objects, across four physical encodings (WKT, WKB, GeoArrow
separate-coordinate, GeoArrow interleaved-coordinate), plus streaming
schema inference (geoarrow_geos.h:61-123).

This package is NOT a port: the reference tells us WHAT to compute
(encoding semantics, null/empty handling, schema-promotion lattices, the
roundtrip fixture corpus); execution is idiomatic PySpark — DataFrames,
Catalyst-optimizable column expressions wherever possible, and vectorized
pandas/Arrow UDFs (zero per-row Python in hot paths) where geometry
semantics require it.

Layout:
  kernels/    pure-NumPy geometry kernels (WKB/WKT parse+write, GeoArrow
              columnar layout, schema inference) — no Spark imports
  functions/  Spark column expressions + pandas UDFs (st_* surface, cells)
  operators/  spatial joins, kNN, tiling, dedup, similarity, text stats
  sources/    synthetic web-pages table, Iceberg-shaped checkpoint store
  streaming/  watermarked streaming ingest
"""

__version__ = "0.1.0"

# The reference reports its GEOS/geoarrow versions via
# GeoArrowGEOSVersionGEOS/VersionGeoArrow (geoarrow_geos.c:13-15).
# We have no GEOS; the equivalent surface is the package version plus the
# version of the geometry-kernel behavior contract we implement.
__geoarrow_equiv_version__ = "0.2.0-SNAPSHOT"  # geoarrow_geos_test.cc:50
__geos_equiv_version__ = None  # no GEOS in-process; kernels are NumPy
