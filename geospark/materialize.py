"""Plan materialization with a pluggable reliability tier (r5).

Iterative operators (connected components, cell compaction, kNN ring
expansion) and branch-reused subplans (join coverings, frozen ``_rid``
row ids) must cut lineage: without it Catalyst re-analysis is
O(rounds^2) and identical Python-bearing subtrees re-execute once per
branch (no exchange reuse — see BENCH notes).  The default tier is
``DataFrame.localCheckpoint(eager=True)``: executor-local block
storage, no I/O to a shared filesystem, exactly right for local[n] and
for clusters where task retry is acceptable recovery.  Its limitation
on a real multi-executor cluster is that a lost executor loses its
blocks AND the lineage needed to recompute them — downstream stages
then fail the job.

``materialize()`` is the single choke point every operator routes
through.  Flipping one Spark conf swaps every site to reliable
``DataFrame.checkpoint()`` (writes to the SparkContext checkpoint
directory — HDFS/S3/ABFS on a cluster — so any executor can reload any
partition after a loss):

    spark.conf.set("spark.geospark.reliableCheckpoint", "true")
    spark.conf.set("spark.geospark.checkpointDir", "s3://bucket/ck")
    # or call spark.sparkContext.setCheckpointDir(...) yourself

Semantics are identical either way: the returned DataFrame has frozen
rows (important for nondeterministic sources — monotonically_increasing_id,
samples) and truncated lineage.  Reliable mode costs one distributed
write per materialization; at 100 TB that is the price of not
restarting a multi-hour dedup/CC job on the first lost executor.
"""

from __future__ import annotations

RELIABLE_CONF = "spark.geospark.reliableCheckpoint"
CKDIR_CONF = "spark.geospark.checkpointDir"


def reliable_enabled(spark) -> bool:
    return str(spark.conf.get(RELIABLE_CONF, "false")).lower() == "true"


def materialize(df, *, eager: bool = True):
    """Freeze ``df``'s rows and cut its lineage.

    Default: ``localCheckpoint`` (fast, executor-local).  With
    ``spark.geospark.reliableCheckpoint=true``: ``checkpoint()`` to the
    SparkContext checkpoint dir (set explicitly or via
    ``spark.geospark.checkpointDir``), surviving executor loss.
    """
    spark = df.sparkSession
    if not reliable_enabled(spark):
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        ckdir = spark.conf.get(CKDIR_CONF, None)
        if not ckdir:
            raise ValueError(
                f"{RELIABLE_CONF}=true needs a checkpoint directory: "
                f"set {CKDIR_CONF} or call "
                "spark.sparkContext.setCheckpointDir(...)")
        sc.setCheckpointDir(ckdir)
    return df.checkpoint(eager=eager)
