"""Structured logging.

Replaces the reference's ad-hoc prints (and its DISPLAY-probe side effect,
orderParam_lib.py:33-38) with a namespaced stdlib logger.
"""

from __future__ import annotations

import logging

_LOGGER = None


def get_logger(name: str = "waterorderlib_tpu") -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger(name)
        if not logger.handlers:
            h = logging.StreamHandler()
            h.setFormatter(
                logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
            )
            logger.addHandler(h)
            logger.setLevel(logging.INFO)
        _LOGGER = logger
    return _LOGGER
