"""Tracing and per-stage timing.

The reference's only observability is wall-clock timing around each eval
query aggregated into EfficiencyMetrics (run_evaluation.py:158,198;
eval_protocol.py:469-505), with the per-component fields never populated
(SURVEY.md §5). Here:

- `StageTimer` populates those component fields for real (router /
  retrieval / generation columns in the same schema, so results remain
  comparable);
- `trace` wraps `jax.profiler` so a TPU trace can be captured around any
  region (open with TensorBoard / xprof);
- `device_sync` forces completion of device work for honest timing — note
  that `jax.block_until_ready` is NOT a reliable barrier on relayed PJRT
  platforms (observed on axon), so this transfers a scalar.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def device_sync(x=None) -> None:
    """Barrier: force completion of all dispatched device work."""
    if x is not None:
        leaves = jax.tree.leaves(x)
        if leaves:
            arr = leaves[-1]
            np.asarray(arr if getattr(arr, "ndim", 1) == 0 else arr.ravel()[0])
            return
    # Fallback: run and fetch a trivial program (executes after queued work).
    np.asarray(jax.numpy.zeros(()))


class StageTimer:
    """Accumulates per-stage wall-clock seconds across queries.

    Usage:
        timer = StageTimer()
        with timer.stage("retrieval"):
            ...
        metrics = evaluate_efficiency(timer.totals("total"),
                                      retrieval_times=timer.totals("retrieval"))
    """

    def __init__(self, sync: bool = False):
        self.sync = sync
        self._stages: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, result=None) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            if self.sync:
                device_sync(result)
            self._stages[name].append(time.time() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._stages[name].append(seconds)

    def totals(self, name: str) -> List[float]:
        return list(self._stages.get(name, []))

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self._stages.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": int(arr.size),
                "total_s": float(arr.sum()),
                "mean_ms": float(arr.mean() * 1000),
                "p95_ms": float(np.percentile(arr, 95) * 1000),
            }
        return out


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace around a region (no-op if unsupported)."""
    if log_dir is None:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - platform dependent
        logger.warning("profiler trace unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info("Saved profiler trace to %s", log_dir)
            except Exception:  # pragma: no cover
                pass


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside a trace (TraceAnnotation); annotation
    failures never mask the body's own exceptions."""
    cm = None
    try:
        cm = jax.profiler.TraceAnnotation(name)
        cm.__enter__()
    except Exception:  # pragma: no cover - profiler unavailable
        cm = None
    try:
        yield
    finally:
        if cm is not None:
            try:
                cm.__exit__(None, None, None)
            except Exception:  # pragma: no cover
                pass
