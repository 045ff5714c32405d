"""Run-scoped distributed counters for silent-cap / convergence visibility.

VERDICT r2 finding #5 / next-round item 8: operators that bound their work
(fingerprint caps, candidate prefilters, iteration limits) must surface HOW
MUCH they dropped — correctness oracles that encode the same cap can't see
it, so the counter is the only witness.

Implementation: one small named Ray actor per run (get-or-create). Stages
call :func:`incr` fire-and-forget from inside map_batches/map_groups tasks;
the driver reads the totals with :func:`snapshot` after the pipeline is
consumed. The actor holds a dict of int64 counters — O(#counter names)
memory, no per-row traffic (stages increment once per batch/group with the
batch total).
"""

from __future__ import annotations

import ray

_ACTOR_NAME = "hnr_run_metrics"


@ray.remote(num_cpus=0)
class _Counters:
    def __init__(self):
        self._c: dict[str, int] = {}

    def incr(self, key: str, n: int) -> None:
        self._c[key] = self._c.get(key, 0) + int(n)

    def snapshot(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self) -> None:
        self._c.clear()


#: cached handle — a non-detached named actor is destroyed once its handle
#: refcount drops to zero, so creating a throwaway handle per incr() races
#: actor GC against the in-flight increment (observed: fire-and-forget
#: incr lost, snapshot() re-creating an EMPTY actor). One module-level
#: handle per process pins the actor for the process lifetime and makes
#: incr→snapshot ordering per-handle FIFO.
_HANDLE = None


def _actor():
    global _HANDLE
    if _HANDLE is None:
        _HANDLE = _Counters.options(
            name=_ACTOR_NAME, get_if_exists=True, lifetime=None
        ).remote()
    return _HANDLE


def _refresh():
    """Drop the cached handle (stale after ray.shutdown → ray.init in the
    same process) and re-resolve the named actor."""
    global _HANDLE
    _HANDLE = None
    return _actor()


def incr(key: str, n: int) -> None:
    """Fire-and-forget increment — safe to call from worker tasks."""
    if n:
        try:
            _actor().incr.remote(key, int(n))
        except Exception:
            _refresh().incr.remote(key, int(n))


def snapshot() -> dict[str, int]:
    try:
        return ray.get(_actor().snapshot.remote())
    except ray.exceptions.RayActorError:
        return ray.get(_refresh().snapshot.remote())


def reset() -> None:
    try:
        ray.get(_actor().reset.remote())
    except ray.exceptions.RayActorError:
        ray.get(_refresh().reset.remote())
