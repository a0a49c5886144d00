"""Wall-clock timing utilities.

The reference times everything with gettimeofday wrappers (microtime,
spmv.cpp:92-100) and CSR5 prints a per-phase converter breakdown
(anonymouslib_avx512.h:210-213).  Here: a context-manager Timer plus a
PhaseTimer that accumulates named phases, used by the converter and the
benchmark harness so that pre-processing cost is a first-class, reported
metric (the reference treats conversion time the same way, spmv.cpp:1009).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class Timer:
    """A simple start/stop wall-clock timer (seconds)."""

    elapsed: float = 0.0
    _t0: float | None = None

    def start(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def stop(self) -> float:
        if self._t0 is None:
            raise RuntimeError("Timer.stop() without start()")
        self.elapsed += time.perf_counter() - self._t0
        self._t0 = None
        return self.elapsed

    def __enter__(self) -> "Timer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


@dataclass
class PhaseTimer:
    """Accumulates wall-clock time per named phase.

    Used by the SELL converter to report a malloc/sort/pack style breakdown,
    mirroring the reference converter's phase prints
    (csr5 anonymouslib_avx512.h:210-213).
    """

    phases: dict[str, float] = field(default_factory=dict)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    @property
    def total(self) -> float:
        return sum(self.phases.values())

    def report(self) -> str:
        lines = [f"  {k:<24s} {v * 1e3:10.3f} ms" for k, v in self.phases.items()]
        lines.append(f"  {'total':<24s} {self.total * 1e3:10.3f} ms")
        return "\n".join(lines)
