"""Round-7 guards for the iterative-graph block-freeing machinery.

The round-6 verdict flagged that dup_graph_core_peel's unpersist loop
depends on _ckpt_id resolving the RDD a localCheckpoint persisted — if
the py4j expression silently returned None the unpersist would be a
no-op and every invocation would leak 3 edge-set copies into the block
manager.  These tests pin (a) the resolution expression itself on a
real checkpointed frame and (b) the end-to-end invariant that running
the peel does not grow the session's persistent-RDD set.
"""

from __future__ import annotations


def _ckpt_rdd_id(df):
    # the exact expression corpus_graph.dup_graph_core_peel and
    # operators/components.py use to find the block-backed RDD
    return int(df._jdf.queryExecution().analyzed().rdd().id())


def test_ckpt_id_resolves_on_checkpointed_frame(spark):
    df = spark.range(100).localCheckpoint(eager=True)
    rid = _ckpt_rdd_id(df)
    assert isinstance(rid, int)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert jmap.get(rid) is not None, (
        "analyzed().rdd() did not resolve to a persisted RDD — the "
        "unpersist loops in corpus_graph/components are no-ops"
    )
    jmap.get(rid).unpersist(False)


def test_core_peel_frees_its_checkpoint_blocks(spark, sf_dir):
    from nemscraper_spark.queries import REGISTRY

    def persisted_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    before = persisted_ids()
    REGISTRY["dup_graph_core_peel"].fn(spark, sf_dir).collect()
    leaked = persisted_ids() - before
    assert not leaked, f"peel leaked persistent RDDs: {sorted(leaked)}"
