"""Structured logging setup.

Rebuild of the reference's tracing initialisation
(``/root/reference/src/main.rs:141-161``): JSON-formatted records with
target/level/thread ids, level from config (``config.rs:289-302``), optional
file output.
"""

from __future__ import annotations

import json
import logging
import sys
import threading
import time
from typing import Optional

from .config import LoggingConfig

_LEVELS = {
    "trace": logging.DEBUG,  # Python has no TRACE; map to DEBUG
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}


class JsonFormatter(logging.Formatter):
    """JSON log records shaped like tracing-subscriber's json output
    (timestamp, level, target, fields.message, threadId)."""

    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "timestamp": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime(record.created)
            )
            + f".{int(record.msecs):03d}Z",
            "level": record.levelname,
            "target": record.name,
            "threadId": threading.get_ident(),
            "fields": {"message": record.getMessage()},
        }
        if record.exc_info:
            payload["fields"]["exception"] = self.formatException(record.exc_info)
        return json.dumps(payload)


def init_logging(config: Optional[LoggingConfig] = None) -> None:
    """Initialise root logging per the logging config section."""
    config = config or LoggingConfig()
    level = _LEVELS.get(config.level.lower(), logging.INFO)

    handler: logging.Handler
    if config.file_path:
        handler = logging.FileHandler(config.file_path)
    else:
        handler = logging.StreamHandler(sys.stderr)

    if config.json_format:
        handler.setFormatter(JsonFormatter())
    else:
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname)-5s %(name)s: %(message)s",
                datefmt="%Y-%m-%dT%H:%M:%S",
            )
        )

    root = logging.getLogger()
    root.handlers[:] = [handler]
    root.setLevel(level)


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(f"tss_tpu.{name}")
