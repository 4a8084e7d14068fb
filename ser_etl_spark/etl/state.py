"""Sync state: per-table high watermarks (reference A4).

The reference keeps ``table -> last_sync_time`` in process memory
(``/root/reference/etl-service/src/sync.py:25,49-50``) and therefore
restarts from scratch. Here the watermarks persist as a small JSON
document next to the snapshot store — the batch analog of a Structured
Streaming checkpoint. Atomic replace keeps a crashed writer from
corrupting state.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile


class WatermarkStore:
    """Durable ``{table: last_sync_time}`` map."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._state: dict[str, str] = {}
        self._load()

    def _load(self) -> None:
        try:
            with open(self.path) as f:
                self._state = json.load(f)
        except (OSError, json.JSONDecodeError):
            self._state = {}

    def get(self, table: str) -> dt.datetime | None:
        raw = self._state.get(table)
        return dt.datetime.fromisoformat(raw) if raw else None

    def advance(self, table: str, ts: dt.datetime | None) -> None:
        """Move the watermark forward (never backward)."""
        if ts is None:
            return
        current = self.get(table)
        if current is None or ts > current:
            self._state[table] = ts.isoformat()
            self._flush()

    def _flush(self) -> None:
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self._state, f, indent=2, sort_keys=True)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def as_dict(self) -> dict[str, str]:
        return dict(self._state)
