"""Tracing / profiling hooks (SURVEY §5).

The reference has no profiling at all (its only hook is a commented-out
token-count log, `kaldi-decoder/csrc/faster-decoder.cc:164`).  The
TPU-native plan replaces that with:

* :func:`trace` — a context manager around :func:`jax.profiler.trace`:
  wrap any decode call to capture a TensorBoard/XPlane device trace
  (per-op device timings of the frame scan, HBM transfers, etc.);
* :func:`annotate` — a ``StepTraceAnnotation`` wrapper so each decode
  chunk shows up as a named step in the trace viewer;
* wall-clock decode timing threaded into :class:`DecodeStats`
  (``wall_seconds`` / ``frames_per_second`` /
  ``audio_seconds_per_second``), the frames/s observability the
  reference never reports.

All hooks degrade to no-ops if the profiler backend is unavailable
(e.g. under constrained relays), so production decode never fails on a
profiling feature.
"""

from __future__ import annotations

import contextlib
import time

from kaldi_decoder_tpu.utils.logging import get_logger

logger = get_logger()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace of everything inside the block.

    Usage::

        with profiling.trace("/tmp/kdtpu-trace"):
            result = decoder.decode(scores)

    View with TensorBoard's profile plugin (or xprof).  Falls back to a
    no-op (with a warning) when the profiler cannot start.
    """
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover - backend-dependent
        logger.warning("jax.profiler trace unavailable: %s", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                logger.warning("jax.profiler stop_trace failed: %s", e)


def annotate(name: str, step: int = 0):
    """Named step annotation for the trace viewer (no-op without a trace)."""
    import jax

    try:
        return jax.profiler.StepTraceAnnotation(name, step_num=step)
    except Exception:  # pragma: no cover - backend-dependent
        return contextlib.nullcontext()


class WallTimer:
    """Tiny wall-clock timer; ``elapsed`` is valid after the block exits.

    Callers are responsible for device synchronization (a host fetch of
    any output scalar is the reliable barrier under relayed backends).
    """

    def __enter__(self):
        self.elapsed = 0.0
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False
