"""Structured per-iteration metrics.

Replaces the reference's print-based iteration tables (gps/mbgps.py:313-317,
rgps/mbrgps.py:810-816) with an append-only recorder that keeps numeric history
queryable and can still render the reference-style table.
"""

from __future__ import annotations

import json
import time
from typing import Any


class MetricsRecorder:
    def __init__(self, name: str = "solver"):
        self.name = name
        self.records: list[dict[str, Any]] = []
        self._t0 = time.perf_counter()
        self._header_keys: tuple[str, ...] | None = None

    def reset(self) -> None:
        """Clear history (solver ``run()`` calls this on entry, so the recorded
        history always describes the latest run — the invariant the
        history-vs-trace tests pin)."""
        self.records = []
        self._t0 = time.perf_counter()
        self._header_keys = None

    def log(self, iteration: int, **values) -> dict[str, Any]:
        rec = {
            "iter": iteration,
            "wall_time": time.perf_counter() - self._t0,
            **{k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in values.items()},
        }
        self.records.append(rec)
        return rec

    def history(self, key: str) -> list[float]:
        return [r[key] for r in self.records if key in r]

    def to_jsonl(self) -> str:
        return "\n".join(json.dumps(r) for r in self.records)

    def format_last(self) -> str:
        """Render the newest record as a fixed-width row, prefixed by a header
        line whenever this record's columns differ from the last-printed header
        (solvers log an init record before the first verbose print, and
        accepted/rejected iterations can carry different key sets, so a
        ``first record`` check would never print a header and columns could
        silently shift) — what solver ``run(verbose=True)`` prints."""
        if not self.records:
            return ""
        rec = self.records[-1]
        keys = tuple(k for k in rec if k != "wall_time")
        row = " ".join(
            f"{rec[k]:>12.4g}" if isinstance(rec[k], (int, float))
            else f"{str(rec[k]):>12s}"
            for k in keys
        )
        if keys != self._header_keys:
            self._header_keys = keys
            header = " ".join(f"{k:>12s}" for k in keys)
            return header + "\n" + row
        return row

    def table(self) -> str:
        """Reference-style fixed-width iteration table."""
        if not self.records:
            return ""
        keys = [k for k in self.records[0] if k != "wall_time"]
        header = " ".join(f"{k:>12s}" for k in keys)
        rows = [
            " ".join(
                f"{r.get(k, float('nan')):12.4g}"
                if isinstance(r.get(k), (int, float))
                else f"{str(r.get(k)):>12s}"
                for k in keys
            )
            for r in self.records
        ]
        return "\n".join([header] + rows)
