"""Relational/dataflow operators (SURVEY.md §2.2): extraction, spatial
joins, tiling, plus the training-data-pipeline surface (dedup,
similarity, text analysis)."""
