"""Checkpoint run identity: stable for a checkpoint's lifetime, fresh on
recreation, atomic under concurrent first attach, URI-parse correct."""

from __future__ import annotations

import os
import shutil
import threading

from mobilitydatalakebenchmark_spark.streaming.run_identity import (
    checkpoint_run_id,
)


def test_stable_within_checkpoint_lifetime(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    assert checkpoint_run_id(ckpt) == checkpoint_run_id(ckpt)


def test_recreated_checkpoint_gets_new_identity(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    first = checkpoint_run_id(ckpt)
    shutil.rmtree(ckpt)
    assert checkpoint_run_id(ckpt) != first


def test_file_uri_resolves_to_same_local_dir(tmp_path):
    # file:///abs/path must hit the same nonce as the bare path — and
    # must NOT fold a URI authority into the filesystem path
    ckpt = str(tmp_path / "ckpt")
    rid = checkpoint_run_id(ckpt)
    assert os.path.exists(os.path.join(ckpt, "_run_nonce"))
    # same nonce file, different checkpoint STRING -> ids differ only by
    # the path component of the hash; what matters is one single nonce
    checkpoint_run_id("file://" + ckpt)
    nonces = [n for n in os.listdir(ckpt) if n.startswith("_run_nonce")]
    assert nonces == ["_run_nonce"]
    # resuming the bare path still sees its original identity
    assert checkpoint_run_id(ckpt) == rid


def test_remote_authority_does_not_touch_local_fs(tmp_path):
    # file://somehost/data/ckpt: the authority is a host, not a local
    # dir — naive prefix-stripping would mkdir /somehost/... (or here,
    # a relative dir); the id must still be deterministic (path-only)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        uri = "file://somehost/data/ckpt"
        assert checkpoint_run_id(uri) == checkpoint_run_id(uri)
        assert os.listdir(tmp_path) == []  # nothing created locally
    finally:
        os.chdir(cwd)


def test_concurrent_first_attach_agrees_on_one_nonce(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    ids: list[str] = []
    barrier = threading.Barrier(8)

    def attach():
        barrier.wait()
        ids.append(checkpoint_run_id(ckpt))

    threads = [threading.Thread(target=attach) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(set(ids)) == 1  # one winner, everyone reads it
    leftovers = [n for n in os.listdir(ckpt) if n.endswith(".tmp")]
    assert leftovers == []  # losers cleaned their tmp candidates
