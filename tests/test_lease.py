"""Single-writer run lease (engine/lease.py): refusal, release, stale
breaking, token safety, and TierPipeline.run() integration."""

from __future__ import annotations

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.lease import LeaseHeldError, RunLease  # noqa: E402


def test_second_acquire_refused(tmp_path):
    root = str(tmp_path)
    a = RunLease(root, owner="a").acquire()
    with pytest.raises(LeaseHeldError, match="being written by a"):
        RunLease(root, owner="b").acquire()
    a.release()
    assert not os.path.exists(a.path)
    RunLease(root, owner="b").acquire().release()  # free after release


def test_context_manager_releases_on_error(tmp_path):
    root = str(tmp_path)
    with pytest.raises(ValueError):
        with RunLease(root, owner="a"):
            assert os.path.exists(os.path.join(root, RunLease.FILE))
            raise ValueError("boom")
    RunLease(root, owner="b").acquire().release()


def _write_lease(root, **over):
    st = {
        "owner": "ghost",
        "pid": os.getpid(),
        "host": os.uname().nodename,
        "token": "ghost-token",
        "acquired_unix": time.time(),
        "heartbeat_unix": time.time(),
        "ttl_s": 3600.0,
    }
    st.update(over)
    path = os.path.join(root, RunLease.FILE)
    with open(path, "w") as f:
        json.dump(st, f)
    return path


def test_dead_pid_lease_broken(tmp_path):
    root = str(tmp_path)
    _write_lease(root, pid=2**22 + 12345)  # beyond pid_max default
    b = RunLease(root, owner="b").acquire()  # breaks the dead holder
    assert b.held()
    b.release()


def test_expired_heartbeat_broken_even_crosshost(tmp_path):
    root = str(tmp_path)
    _write_lease(
        root, host="other-host", pid=1, heartbeat_unix=time.time() - 10, ttl_s=5.0
    )
    RunLease(root, owner="b").acquire().release()


def test_live_crosshost_lease_not_broken(tmp_path):
    """A foreign host's lease with a fresh heartbeat must be respected even
    though its pid is meaningless here."""
    root = str(tmp_path)
    _write_lease(root, host="other-host", pid=2**22 + 12345)
    with pytest.raises(LeaseHeldError):
        RunLease(root, owner="b").acquire()


def test_release_after_break_leaves_new_holder(tmp_path):
    """A holder whose stale lease was broken cannot unlink the new holder's
    lease (token mismatch), and its heartbeat reports the loss."""
    root = str(tmp_path)
    ghost = RunLease(root, owner="ghost", ttl_s=0.05).acquire()
    time.sleep(0.1)  # ghost's heartbeat expires
    b = RunLease(root, owner="b").acquire()  # breaks ghost
    ghost.release()  # must be a no-op on b's file
    assert os.path.exists(b.path)
    with open(b.path) as f:
        assert json.load(f)["owner"] == "b"
    with pytest.raises(LeaseHeldError, match="lost lease"):
        ghost_again = RunLease(root, owner="ghost")
        ghost_again._token = "ghost-token"
        ghost_again.heartbeat()
    b.heartbeat()  # live holder still fine
    b.release()


def test_corrupt_lease_file_breakable_when_old(tmp_path):
    root = str(tmp_path)
    path = os.path.join(root, RunLease.FILE)
    with open(path, "w") as f:
        f.write("{torn")
    old = time.time() - 10
    os.utime(path, (old, old))
    RunLease(root, owner="b", ttl_s=5.0).acquire().release()


def test_pipeline_run_serialized(spark, tmp_path):
    """run() refuses while another writer holds the root, releases the
    lease on completion, and a crashed (dead-pid) holder is broken."""
    from engine.pipeline import TierPipeline
    from engine.synth import synth_transcripts

    root = str(tmp_path / "tiers")
    t0 = synth_transcripts(spark, n_convs=4, hot_turns=40)
    pipe = TierPipeline(spark, root)

    other = RunLease(root, owner="other-run").acquire()
    with pytest.raises(LeaseHeldError):
        pipe.run(t0, run_id="r1")
    other.release()

    pipe.run(t0, run_id="r1")
    assert not os.path.exists(os.path.join(root, RunLease.FILE))

    # crashed holder (dead pid, same host): next run self-heals
    _write_lease(root, pid=2**22 + 54321)
    pipe.run(t0, run_id="r2")
    assert not os.path.exists(os.path.join(root, RunLease.FILE))
