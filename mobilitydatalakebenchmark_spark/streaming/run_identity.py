"""Per-checkpoint-creation run identity for replay-idempotent sinks.

Every foreachBatch maintainer here stamps its writes with
``(run_id, epoch_id)`` (or keys an epoch high-water mark under
``run_id=``) so that a same-run replay of an epoch is a no-op.
``run_id = md5(checkpoint path)`` alone is NOT enough: if the
checkpoint dir is deleted but the maintained table/state kept, the new
stream restarts at epoch 0 under the OLD run_id, and the replay guard
then treats the genuinely-new batches as replays and silently drops
them. Mixing in a nonce file created inside the checkpoint dir on
first start makes a recreated checkpoint a NEW identity (fresh epochs
apply), while a resumed checkpoint — the real replay case — keeps its
nonce and stays idempotent.
"""

from __future__ import annotations

import hashlib
import os
import uuid

_NONCE_FILE = "_run_nonce"


def checkpoint_run_id(checkpoint: str) -> str:
    """16-hex run id stable for the LIFETIME of the checkpoint dir."""
    local = checkpoint
    if local.startswith("file:"):
        local = local[len("file:"):]
        while local.startswith("//"):
            local = local[1:]
    try:
        os.makedirs(local, exist_ok=True)
        nonce_path = os.path.join(local, _NONCE_FILE)
        if not os.path.exists(nonce_path):
            tmp = nonce_path + f".{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as fh:
                fh.write(uuid.uuid4().hex)
            # atomic-ish: first creator wins, concurrent attachers read it
            if not os.path.exists(nonce_path):
                os.replace(tmp, nonce_path)
            else:
                os.remove(tmp)
        with open(nonce_path) as fh:
            nonce = fh.read().strip()
    except OSError:
        # non-local checkpoint URI (hdfs://, s3a://): the dir cannot be
        # recreated out from under us by local tooling nearly as easily,
        # and Spark itself owns its lifecycle — fall back to path-only
        nonce = ""
    return hashlib.md5(f"{checkpoint}\n{nonce}".encode()).hexdigest()[:16]
