"""Round-5 session-2 operator tests: quality-ranked cluster collapse,
incremental batch dedup, Hilbert layout keys, Hilbert page packing."""

from __future__ import annotations


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestBestOfCluster:
    def test_argmax_and_tiebreak(self, spark):
        from geospark.operators.dedup import best_of_cluster
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)],
            ["doc_id", "cluster_id"])
        scored = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.9),   # tie on 0.9 -> keep id 2
             (7, 0.1), (8, 0.4),             # keep 8
             (9, 0.0)],                      # singleton keeps itself
            ["doc_id", "quality"])
        got = _rows(best_of_cluster(clusters, scored))
        assert got == [(1, 2, 0.9, 3), (7, 8, 0.4, 2), (9, 9, 0.0, 1)]

    def test_plan_single_agg_no_window(self, spark):
        """The argmax is ONE cluster-keyed aggregate with a map-side
        partial (max(struct)) — no row_number window, no second
        exchange after the join."""
        from geospark.operators.dedup import best_of_cluster
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1)], ["doc_id", "cluster_id"])
        scored = spark.createDataFrame(
            [(1, 0.5), (2, 0.9)], ["doc_id", "quality"])
        plan = (best_of_cluster(clusters, scored)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Window" not in plan
        assert "partial_max" in plan or "HashAggregate" in plan


class TestBatchDedupStatus:
    def _mk(self, spark):
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark woods tonight")
        near = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark woods tomorrow")
        existing = spark.createDataFrame(
            [(1, base), (2, "completely unrelated corpus text about "
                            "spark engines and parquet column pruning "
                            "at petabyte scale every day")],
            ["doc_id", "text"])
        incoming = spark.createDataFrame(
            [(10, base),                        # exact dup of 1
             (11, near),                        # near dup of 1
             (12, "nothing like anything else in the corpus at all "
                  "zebra quantum volcano umbrella seventeen")],
            ["doc_id", "text"])
        return incoming, existing

    def test_statuses_and_precedence(self, spark):
        from geospark.operators.dedup import batch_dedup_status
        incoming, existing = self._mk(spark)
        got = dict(_rows(batch_dedup_status(incoming, existing)))
        # exact beats near: doc 10 also shares every band with doc 1
        assert got == {10: "exact_dup", 11: "near_dup", 12: "new"}

    def test_short_doc_exact_only(self, spark):
        """A doc below one k-shingle has no bands: it can be an exact
        dup but never a near dup — the documented engine-shared rule."""
        from geospark.operators.dedup import batch_dedup_status
        existing = spark.createDataFrame(
            [(1, "tiny doc")], ["doc_id", "text"])
        incoming = spark.createDataFrame(
            [(10, "tiny doc"), (11, "tiny dog")], ["doc_id", "text"])
        got = dict(_rows(batch_dedup_status(incoming, existing)))
        assert got == {10: "exact_dup", 11: "new"}

    def test_plan_semi_joins_no_cartesian(self, spark):
        from geospark.operators.dedup import batch_dedup_status
        incoming, existing = self._mk(spark)
        plan = (batch_dedup_status(incoming, existing)
                ._jdf.queryExecution().executedPlan().toString())
        assert "LeftSemi" in plan
        assert "Cartesian" not in plan and "NestedLoop" not in plan
