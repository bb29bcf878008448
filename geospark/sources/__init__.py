"""Sources & sinks: deterministic synthetic web-pages table (input_hint
schema), zone polygon dimension, Iceberg-shaped checkpoint store."""
