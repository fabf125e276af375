"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5). Here: an opt-in
``jax.profiler`` trace context (view with TensorBoard/XProf) and a simple
throughput meter for the metrics BASELINE.md tracks (examples/s, genomes/s).
Enable on the CLI with ``--profile-dir`` or env ``GM2_PROFILE_DIR``.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field
from typing import Dict


@contextlib.contextmanager
def trace(profile_dir: str | None = None):
    """Profile the enclosed block with jax.profiler if a directory is given
    (argument or GM2_PROFILE_DIR); no-op otherwise."""
    profile_dir = profile_dir or os.environ.get("GM2_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield


@dataclass
class Throughput:
    """Windowed throughput meter: items/s over named phases."""

    counts: Dict[str, float] = field(default_factory=dict)
    seconds: Dict[str, float] = field(default_factory=dict)
    _starts: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, items: float):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0.0) + items
            self.seconds[name] = self.seconds.get(name, 0.0) + dt

    def add(self, name: str, items: float, seconds: float) -> None:
        """Record a phase measured externally (item count known only after)."""
        self.counts[name] = self.counts.get(name, 0.0) + items
        self.seconds[name] = self.seconds.get(name, 0.0) + seconds

    def rate(self, name: str) -> float:
        return self.counts.get(name, 0.0) / max(self.seconds.get(name, 0.0), 1e-12)

    def report(self) -> str:
        lines = [f"{name}: {self.rate(name):,.1f}/s "
                 f"({self.counts[name]:,.0f} in {self.seconds[name]:.2f}s)"
                 for name in self.counts]
        return "\n".join(lines)
