"""Crash-atomic local-file helpers shared by the control-plane stores
(TaskStore, TopicStore). The reference persists both to BoltDB whose
commits are atomic (/root/reference/services/task_store,
services/alert/dao.go); the stdlib equivalent is write-temp +
``os.replace`` — readers only ever see a complete file and a crash
mid-write leaves the previous version intact."""

from __future__ import annotations

import json
import os
import tempfile

__all__ = ["atomic_write_json"]


def atomic_write_json(path: str, obj, **dump_kwargs) -> None:
    d = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(
        dir=d, prefix="." + os.path.basename(path) + "_", suffix=".tmp"
    )
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(obj, fh, **dump_kwargs)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
