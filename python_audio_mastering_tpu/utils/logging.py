"""Structured logging (SURVEY.md §5: the reference logs via bare print()).

``get_logger`` returns a stdlib logger with either human-readable or
JSON-line formatting (``PAM_LOG_FORMAT=json`` — the Cloud Logging-friendly
mode for the serving deployment).  One quantitative convention is kept from
the reference: the LUFS measurement line (engine:221) flows through
``log_loudness`` so log scrapers keep working.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

__all__ = ["get_logger", "log_loudness"]


class _JsonFormatter(logging.Formatter):
    def format(self, record):
        payload = {
            "ts": round(time.time(), 3),
            "severity": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
        }
        if record.exc_info:
            payload["exc"] = self.formatException(record.exc_info)
        extra = getattr(record, "extra_fields", None)
        if extra:
            payload.update(extra)
        return json.dumps(payload)


def get_logger(name: str = "pam") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        if os.environ.get("PAM_LOG_FORMAT") == "json":
            handler.setFormatter(_JsonFormatter())
        else:
            handler.setFormatter(logging.Formatter(
                "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("PAM_LOG_LEVEL", "INFO"))
        logger.propagate = False
    return logger


def log_loudness(logger: logging.Logger, measured: float, gain_db: float):
    """The reference's one quantitative log line (engine:221)."""
    logger.info("Current loudness: %.2f LUFS. Applying %.2f dB gain...",
                measured, gain_db)
