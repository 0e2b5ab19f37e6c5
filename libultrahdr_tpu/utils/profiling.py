"""Per-stage wall-clock timers + gated logging.

Enable timers with UHDR_TPU_PROFILE=1 (accumulates per stage name; dump
with stage_report()).  Enable logs with UHDR_TPU_LOGS=1 — the analog of the
reference's UHDR_ENABLE_LOGS compile flag (ultrahdrcommon.h:34-118), but a
runtime switch.
"""

from __future__ import annotations

import collections
import contextlib
import logging
import os
import time

_ENABLED = os.environ.get("UHDR_TPU_PROFILE", "0") not in ("0", "")
_ACC: dict[str, list] = collections.defaultdict(lambda: [0, 0.0])

_logger = None


def get_logger() -> logging.Logger:
    global _logger
    if _logger is None:
        _logger = logging.getLogger("libultrahdr_tpu")
        if os.environ.get("UHDR_TPU_LOGS", "0") not in ("0", ""):
            _logger.setLevel(logging.DEBUG)
            if not _logger.handlers:
                h = logging.StreamHandler()
                h.setFormatter(logging.Formatter(
                    "%(asctime)s %(name)s %(levelname)s %(message)s"))
                _logger.addHandler(h)
        else:
            _logger.addHandler(logging.NullHandler())
    return _logger


@contextlib.contextmanager
def stage(name: str):
    """Time a pipeline stage.  No-op unless UHDR_TPU_PROFILE=1.

    NB: device work is asynchronous on TPU — a stage that only dispatches
    shows ~0; the time lands in the stage that first fetches results."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        acc = _ACC[name]
        acc[0] += 1
        acc[1] += dt
        get_logger().debug("stage %s: %.1f ms", name, dt * 1e3)


def stage_report() -> dict[str, tuple[int, float]]:
    """{stage: (calls, total_seconds)} accumulated so far."""
    return {k: (v[0], v[1]) for k, v in _ACC.items()}
