"""Checkpoint IDENTITY for the maintainer reset guards.

A streaming checkpoint's identity is the query id Spark records in
``<checkpoint>/metadata`` — a fresh uuid every time the directory is
(re)created. Tokening the maintainers' redelivery watermark on this id
(not the directory PATH) catches the common reset — ``rm -rf`` then
recreate at the same path — which a path token would wave through while
foreachBatch ids silently restart at 0 (code-review r3 round 2).

The id only exists once the query has started, so maintainers resolve
it lazily from inside the first ``foreachBatch`` call rather than
before ``start()``.
"""

from __future__ import annotations

import json
import os


def checkpoint_identity(checkpoint_dir: str) -> str:
    """The streaming query id recorded in the checkpoint's metadata
    file; falls back to the absolute path if the file is unreadable
    (foreign checkpoint layout)."""
    meta = os.path.join(checkpoint_dir, "metadata")
    try:
        with open(meta) as f:
            ident = json.load(f).get("id")
        if ident:
            return str(ident)
    except (OSError, ValueError):
        pass
    return os.path.abspath(checkpoint_dir)
