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
