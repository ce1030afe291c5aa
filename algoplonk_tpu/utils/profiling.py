"""Lightweight profiling / observability for the prover pipeline.

The reference's only profiler is the printed AVM opcode budget after
simulated runs (SURVEY.md section 5); for the TPU build, per-phase wall-clock
and optional JAX profiler traces are the equivalents.

Usage:
    with phase_timer() as t:
        with t.phase("ntt"):
            ...
    t.report()          # -> stderr table

    with jax_trace("/tmp/trace"):   # Perfetto trace for xprof
        prover.prove(...)
"""

from __future__ import annotations

import contextlib
import sys
import time
from collections import OrderedDict


class PhaseTimer:
    def __init__(self):
        self.times = OrderedDict()

    @contextlib.contextmanager
    def phase(self, name: str):
        import jax

        t0 = time.perf_counter()
        try:
            yield
        finally:
            # ensure device work attributed to the phase is finished
            try:
                jax.effects_barrier()
            except Exception:
                pass
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self, file=sys.stderr):
        total = sum(self.times.values()) or 1e-12
        print("---- phase timings ----", file=file)
        for name, t in self.times.items():
            print(f"{name:24s} {t*1e3:10.1f} ms  {100*t/total:5.1f}%", file=file)
        print(f"{'total':24s} {total*1e3:10.1f} ms", file=file)


@contextlib.contextmanager
def phase_timer():
    yield PhaseTimer()


@contextlib.contextmanager
def jax_trace(outdir: str):
    """Capture a JAX profiler (Perfetto/xprof) trace around a block."""
    import jax

    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
