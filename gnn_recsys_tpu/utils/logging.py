"""Module-level logger factory (reference ``logging_config.get_logger``,
``/root/reference/logging_config.py:9-29``): per-module ``logging.Logger``
with a single stream handler at INFO and a timestamped format.

Use alongside :func:`gnn_recsys_tpu.data.io.save_txt` (the append-only
result file): the logger is the console/observability channel, save_txt
the durable experiment record — the same two channels the reference keeps.
"""

from __future__ import annotations

import logging

_FORMAT = "%(asctime)s-%(name)s-%(levelname)s: %(message)s"


def get_logger(name: str) -> logging.Logger:
    """Logger with one INFO stream handler; idempotent per name."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.propagate = False
        logger.setLevel(logging.DEBUG)
        handler = logging.StreamHandler()
        handler.setLevel(logging.INFO)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
    return logger
