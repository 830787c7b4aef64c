import os

from freepose_tpu.parallel.scheduler import WorkShard, current_shard, shard_items
from freepose_tpu.utils.timing import StageTimer


def test_workshard_strided_and_chunked():
    s = WorkShard(1, 3)
    assert s.slice(10) == [1, 4, 7]
    assert s.slice(10, chunk=4) == [4, 5, 6, 7]
    assert WorkShard(2, 3).slice(10, chunk=4) == [8, 9]
    # Union over workers covers everything exactly once.
    strided = sorted(i for w in range(3) for i in WorkShard(w, 3).slice(10))
    assert strided == list(range(10))


def test_current_shard_env(monkeypatch):
    monkeypatch.setenv("FREEPOSE_SHARD_INDEX", "2")
    monkeypatch.setenv("FREEPOSE_SHARD_COUNT", "5")
    s = current_shard()
    assert (s.index, s.count) == (2, 5)
    monkeypatch.delenv("FREEPOSE_SHARD_INDEX")
    monkeypatch.setenv("SLURM_ARRAY_TASK_ID", "3")
    monkeypatch.setenv("SLURM_ARRAY_TASK_COUNT", "8")
    s = current_shard()
    assert (s.index, s.count) == (3, 8)


def test_shard_items():
    items = list("abcdefgh")
    assert shard_items(items, WorkShard(0, 2)) == list("aceg")
    assert shard_items(items, WorkShard(1, 2)) == list("bdfh")


def test_stage_timer():
    t = StageTimer(sync=False)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.total() >= 0
    assert "a" in t.report() and "ms/call" in t.report()
