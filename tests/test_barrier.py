"""Sentinel shard barrier (parallel/barrier.py): publish/wait/clear
semantics and the timeout error path. The real 2-process straggler scenario
runs in test_multiprocess.py."""

import threading
import time

import pytest

from genome_minimizer_2_tpu.parallel import barrier as B


def test_publish_wait_clear(tmp_path):
    out = str(tmp_path / "out.fasta")
    paths = [B.shard_file(out, k) for k in range(3)]
    for p in paths:
        open(p, "w").write("data\n")

    def publish_late():
        time.sleep(0.2)
        for p in paths:
            B.mark_shard_done(p)

    t = threading.Thread(target=publish_late)
    t.start()
    got = B.wait_for_shards(out, 3, timeout_s=5.0)
    t.join()
    assert got == paths
    B.clear_sentinels(out, 3)
    assert not list(tmp_path.glob("*.done"))
    B.clear_sentinels(out, 3)  # idempotent


def test_wait_timeout_names_missing(tmp_path):
    out = str(tmp_path / "out.fasta")
    open(B.shard_file(out, 0), "w").write("x")
    B.mark_shard_done(B.shard_file(out, 0))
    with pytest.raises(TimeoutError, match=r"1/2 shards not done"):
        B.wait_for_shards(out, 2, timeout_s=0.2)


def test_mark_requires_existing_shard(tmp_path):
    with pytest.raises(FileNotFoundError):
        B.mark_shard_done(str(tmp_path / "missing.shard"))
