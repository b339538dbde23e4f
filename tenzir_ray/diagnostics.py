"""Engine diagnostics (reference: operators/diagnostics.md and the
diagnostic machinery in libtenzir/include/tenzir/diagnostics.hpp — each
pipeline run emits structured warning/error events that the
`diagnostics` operator retrieves later).

A named detached Ray actor buffers diagnostic rows (same
ownership-transfer pattern as `stages/pubsub.py`): any worker or the
driver calls :func:`emit` — fire-and-forget, never raising into the hot
path — and :func:`diagnostics` reads the retained history back as a
Dataset with the reference's `tenzir.diagnostic` row shape
(pipeline_id, run, timestamp, message, severity, rendered).

Emission is OFF the hot path by contract: call sites emit once per
batch/condition, not per row, so the actor round-trip amortizes to
nothing at scale (one small message per block-level anomaly)."""

from __future__ import annotations

import time

#: retained diagnostic rows; oldest evicted beyond this
DIAG_RETENTION = 65536

_ACTOR_NAME = "tenzir_ray::diagnostics"


class _DiagStore:
    def __init__(self, retention: int = DIAG_RETENTION):
        self.rows: list[dict] = []
        self.retention = retention
        self.dropped = 0

    def append(self, rows: list[dict]) -> int:
        self.rows.extend(rows)
        if len(self.rows) > self.retention:
            drop = len(self.rows) - self.retention
            del self.rows[:drop]
            self.dropped += drop
        return len(self.rows)

    def read(self, severity: str | None = None) -> list[dict]:
        if severity is None:
            return list(self.rows)
        return [r for r in self.rows if r["severity"] == severity]

    def clear(self) -> int:
        n = len(self.rows)
        self.rows.clear()
        return n


def _store():
    import ray

    try:
        return ray.get_actor(_ACTOR_NAME)
    except ValueError:
        return (ray.remote(_DiagStore)
                .options(name=_ACTOR_NAME, lifetime="detached",
                         get_if_exists=True)
                .remote())


def emit(message: str, severity: str = "warning",
         pipeline_id: str = "", run: int = 1,
         notes: list | None = None) -> None:
    """Record one diagnostic event. Fire-and-forget: failures (Ray not
    initialised, actor dead) are swallowed — a diagnostic must never
    take down the pipeline that raised it."""
    row = {
        "pipeline_id": pipeline_id,
        "hidden": False,
        "run": run,
        "timestamp": time.time(),
        "message": message,
        "severity": severity,
        "notes": [str(n) for n in (notes or [])],
        "rendered": f"{severity}: {message}",
    }
    try:
        import ray

        if not ray.is_initialized():
            return
        _store().append.remote([row])  # no get: fire-and-forget
    except Exception:
        return


def diagnostics(severity: str | None = None):
    """Retained diagnostic events as a Dataset (operators/diagnostics.md
    retro mode; live mode = poll this like ``Lake.follow`` polls the
    WAL). Empty store → empty dataset with the right columns."""
    import ray
    import ray.data as rd

    rows = ray.get(_store().read.remote(severity))
    if not rows:
        rows = [{
            "pipeline_id": "", "hidden": False, "run": 0,
            "timestamp": 0.0, "message": "", "severity": "",
            "notes": [], "rendered": "",
        }]
        return rd.from_items(rows).limit(0)
    return rd.from_items(rows)


def clear() -> int:
    """Drop all retained diagnostics; returns how many were dropped."""
    import ray

    return ray.get(_store().clear.remote())
