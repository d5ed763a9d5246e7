"""Process-0-gated logging.

Single-controller JAX has one Python process per host, so "rank" here is the
JAX process index (multi-host) rather than a GPU rank. Non-zero processes get
a no-op logger, mirroring the reference behavior (reference utils.py:163-179).
"""

from __future__ import annotations

import logging
from typing import Optional


def setup_logging() -> None:
    logging.basicConfig(level=logging.INFO)


class _NoOp:
    """Swallows every attribute access / call (non-primary processes)."""

    def __getattr__(self, *args):
        def no_op(*a, **k):
            pass

        return no_op


def get_logger(name: str, process_index: Optional[int] = None):
    """Return a real logger on process 0, a no-op object elsewhere."""
    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0
    if process_index == 0:
        return logging.getLogger(name)
    return _NoOp()
