"""Tracing/profiling hooks (SURVEY §5.1).

The reference's only instrumentation is wall-clock timing surfaced in the
extended Usage (src/models/common/generate.rs:126-146, params/shared.rs:4-28)
— that is kept in aha_tpu.core.engine.Timing.  On top of it this module adds
the TPU-native layer: `jax.profiler` device traces viewable in
TensorBoard/XProf.

Three entry points:
- `configure(profile_dir=..., profile_port=...)` — called once from the CLI
  (`aha serv --profile-dir ...`) or via env `AHA_PROFILE_DIR`/`AHA_PROFILE_PORT`.
  `profile_port` starts jax.profiler.start_server for live capture.
- `request_trace(name)` — context manager the server/engine wraps one request
  in; writes a trace under profile_dir when configured, else no-op.
- `annotate(name)` / `step_annotation(name, step)` — cheap TraceAnnotations
  that label prefill/decode regions inside a trace.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

_profile_dir: str | None = None
_server_started = False


def configure(profile_dir: str | None = None,
              profile_port: int | None = None) -> None:
    """Set up profiling from CLI flags (env vars as fallback)."""
    global _profile_dir, _server_started
    profile_dir = profile_dir or os.environ.get("AHA_PROFILE_DIR") or None
    if profile_dir:
        os.makedirs(profile_dir, exist_ok=True)
        _profile_dir = profile_dir
    port = profile_port or int(os.environ.get("AHA_PROFILE_PORT", 0) or 0)
    if port and not _server_started:
        import jax

        jax.profiler.start_server(port)
        _server_started = True


def profile_dir() -> str | None:
    return _profile_dir


@contextlib.contextmanager
def request_trace(name: str) -> Iterator[None]:
    """Trace one request end-to-end into profile_dir (no-op unconfigured)."""
    if _profile_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(_profile_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


def annotate(name: str):
    """Label a region inside an active trace (cheap; safe without one)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def step_annotation(name: str, step: int):
    """Label one decode step; XProf groups these into a step timeline."""
    import jax

    return jax.profiler.StepTraceAnnotation(name, step_num=step)
