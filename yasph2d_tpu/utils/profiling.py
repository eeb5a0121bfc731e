"""Profiling: named scopes + trace capture + step-time history.

TPU-native counterpart of the reference's microprofile instrumentation (SURVEY.md
section 5): `microprofile::scope!("Group", "name")` becomes `jax.named_scope`
("Group.name" shows up in XLA op names and in xprof traces), `microprofile::flip!()`
per frame becomes `jax.profiler.StepTraceAnnotation`, and the live web UI becomes
`jax.profiler.start_trace` dumps viewable in TensorBoard / xprof.

The scope names mirror the reference's (e.g. "NeighborhoodSearch.update_dynamic",
"DFSPH.compute_alpha_factors") so a profile of the new engine can be compared
hot-spot by hot-spot with the reference's measurements-in-comments
(neighborhood_search.rs:103-108, morton.rs:6-24).
"""

import collections
import contextlib
import statistics
import time
from typing import Optional

import jax


def scope(group: str, name: str):
    """`microprofile::scope!(group, name)` equivalent: annotates all ops traced
    within with "group.name" (visible in xprof and HLO op metadata)."""
    return jax.named_scope(f"{group}.{name}")


@contextlib.contextmanager
def trace(log_dir: str, step_name: Optional[str] = None):
    """Capture a device trace for everything inside the context.

    View with: tensorboard --logdir <log_dir> (profile plugin / xprof).
    """
    jax.profiler.start_trace(log_dir)
    try:
        if step_name is not None:
            with jax.profiler.StepTraceAnnotation(step_name):
                yield
        else:
            yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Host-side per-step wall-time history (reference: main.rs:61, 277-290 keeps an
    80-sample step duration history for the HUD)."""

    def __init__(self, history_length: int = 80):
        self.history = collections.deque(maxlen=history_length)
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.history.append(time.perf_counter() - self._t0)
        return False

    @property
    def mean(self) -> float:
        return statistics.fmean(self.history) if self.history else 0.0

    @property
    def last(self) -> float:
        return self.history[-1] if self.history else 0.0
