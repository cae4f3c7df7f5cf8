"""Logging (parity: common/log.{h,cpp} — leveled, colored, timestamped
logger with an env switch; the reference runs an async worker thread,
python's logging module already serializes handlers).

Env: SPARKINFER_LOG_LEVEL=debug|info|warn|error (default info),
SPARKINFER_LOG_COLORS=0 to disable colors, SPARKINFER_LOG_TIMESTAMPS=1.
"""

from __future__ import annotations

import logging
import os
import sys

_COLORS = {
    logging.DEBUG: "\x1b[90m",
    logging.INFO: "",
    logging.WARNING: "\x1b[33m",
    logging.ERROR: "\x1b[31m",
}
_RESET = "\x1b[0m"

_LEVELS = {"debug": logging.DEBUG, "info": logging.INFO,
           "warn": logging.WARNING, "warning": logging.WARNING,
           "error": logging.ERROR}

_configured = False


class _Fmt(logging.Formatter):
    def __init__(self, colors: bool, timestamps: bool):
        fmt = "%(name)s: %(message)s"
        if timestamps:
            fmt = "%(asctime)s " + fmt
        super().__init__(fmt, datefmt="%H:%M:%S")
        self.colors = colors

    def format(self, record):
        s = super().format(record)
        if self.colors and record.levelno in _COLORS and _COLORS[record.levelno]:
            return f"{_COLORS[record.levelno]}{s}{_RESET}"
        return s


def _configure():
    global _configured
    if _configured:
        return
    _configured = True
    root = logging.getLogger("sparkinfer")
    level = _LEVELS.get(os.environ.get("SPARKINFER_LOG_LEVEL", "info").lower(),
                        logging.INFO)
    root.setLevel(level)
    h = logging.StreamHandler(sys.stderr)
    colors = os.environ.get("SPARKINFER_LOG_COLORS", "1") != "0" and sys.stderr.isatty()
    timestamps = os.environ.get("SPARKINFER_LOG_TIMESTAMPS", "0") == "1"
    h.setFormatter(_Fmt(colors, timestamps))
    root.addHandler(h)
    root.propagate = False


def get_logger(name: str = "sparkinfer") -> logging.Logger:
    _configure()
    if name != "sparkinfer" and not name.startswith("sparkinfer."):
        name = f"sparkinfer.{name}"
    return logging.getLogger(name)


def log_set_level(level: str):
    _configure()
    logging.getLogger("sparkinfer").setLevel(_LEVELS[level.lower()])
