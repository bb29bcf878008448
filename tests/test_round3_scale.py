"""Round-3 scale work: IVF index materialization + pruned probes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def ivf_setup(spark, tmp_path_factory):
    from geospark.operators.similarity import ivf_index, ivf_train
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = (e.filter(F.col("vec_id") < 64).orderBy("vec_id")
            .select("embedding").collect())
    cent = ivf_train(np.array([r.embedding for r in rows],
                              dtype=np.float64), k=8, iters=5)
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_index(e, cent, path)
    qv = e.filter(F.col("vec_id") == 0) \
        .select("embedding").collect()[0][0]
    return e, cent, path, qv


class TestIvfIndex:
    def test_probe_matches_inline_assignment(self, spark, ivf_setup):
        from geospark.operators.similarity import (ivf_ann_topk,
                                                   ivf_probe_topk)
        e, cent, path, qv = ivf_setup
        inline = [(r.vec_id, r.sim) for r in
                  ivf_ann_topk(e, qv, cent, 10, nprobe=2).collect()]
        probe = [(r.vec_id, r.sim) for r in
                 ivf_probe_topk(spark, path, qv, cent, 10,
                                nprobe=2).collect()]
        assert probe == inline and len(probe) == 10

    def test_probe_plan_is_pruned_scan_without_python(self, spark,
                                                      ivf_setup):
        from geospark.operators.similarity import ivf_probe_topk
        _, cent, path, qv = ivf_setup
        plan = _plan(ivf_probe_topk(spark, path, qv, cent, 10, nprobe=2))
        # partition pruning on the inverted-list column...
        import re
        m = re.search(r"PartitionFilters: \[[^\]]*_list[^\]]*IN", plan)
        assert m, f"no _list partition filter in plan:\n{plan}"
        # ...and no Python evaluation anywhere in the probe
        for marker in ("ArrowEvalPython", "BatchEvalPython",
                       "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in plan, marker

    def test_index_partition_dirs_cover_assignments(self, spark,
                                                    ivf_setup):
        import os
        _, cent, path, _ = ivf_setup
        lists = sorted(int(d.split("=")[1]) for d in os.listdir(path)
                       if d.startswith("_list="))
        assert lists and set(lists) <= set(range(len(cent)))
        # every row lands in exactly one list; total preserved
        n_src = spark.read.parquet(f"{SF}/embeddings.parquet").count()
        assert spark.read.parquet(path).count() == n_src

    def test_catalog_query_routes_through_index(self, spark):
        from geospark import queries as q
        df = q.q_ivf_ann_topk(spark, SF)
        plan = _plan(df)
        assert "PartitionFilters" in plan
        assert "ArrowEvalPython" not in plan
        assert df.count() == 10
