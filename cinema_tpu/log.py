"""Logging utilities (reference: cinema/log.py)."""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s | %(levelname)s | %(process)d | %(name)s | %(message)s"


def get_logger(name: str) -> logging.Logger:
    """Return a configured logger.

    Args:
        name: logger name, usually ``__name__``.

    Returns:
        logger with a single stream handler.
    """
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger
