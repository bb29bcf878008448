"""Spark-facing function surface: Catalyst-friendly column expressions
where possible (cells, bbox, distance), vectorized pandas/Arrow UDFs where
geometry semantics require it (WKB codecs, ray-cast refine)."""
