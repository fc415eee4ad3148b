"""r11 (VERDICT r10 task 6): the iterative family's plan-truncation points
go through ``util.truncate_plan`` — ``localCheckpoint`` by default (cheap,
but lineage-severing: an executor loss fails the job), switchable to the
fault-tolerant ``DataFrame.checkpoint`` API for cluster deployments via
``SPARK_GRAFT_RELIABLE_CHECKPOINT=1``. These tests pin that the env switch
selects the API, and that the reliable path really executes.
"""

from __future__ import annotations

from unittest import mock

from wikidata2pg_spark import util


def test_truncate_plan_env_selects_reliable_checkpoint(spark, monkeypatch, tmp_path):
    df = spark.range(3)
    with mock.patch.object(type(df), "checkpoint", autospec=True) as ck, \
         mock.patch.object(type(df), "localCheckpoint", autospec=True) as lck:
        monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
        util.truncate_plan(df)
        assert lck.called and not ck.called
        lck.reset_mock()
        monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        util.truncate_plan(df, eager=False)
        assert ck.called and not lck.called
        # the eager flag must pass through to whichever API was selected
        assert ck.call_args.kwargs.get("eager") is False


def test_truncate_plan_reliable_path_executes(spark, monkeypatch, tmp_path):
    """Not just API selection: the reliable path must produce the same
    rows and a truncated (source-free) plan, with the checkpoint dir
    auto-provisioned when the session has none configured."""
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    out = util.truncate_plan(spark.range(5))
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3, 4]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Range" not in plan  # lineage truncated: scan of the ckpt RDD
