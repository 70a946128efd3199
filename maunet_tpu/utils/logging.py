"""Stdlib-based logging with a loguru-like feel.

The reference configures loguru globally at import time
(urban_planner/config.py:31-40); here logging is explicit, stdlib-only
(loguru is not a dependency), with an extra SUCCESS level for parity with
the reference's log vocabulary.
"""

from __future__ import annotations

import logging
import sys

SUCCESS = 25
logging.addLevelName(SUCCESS, "SUCCESS")

_CONFIGURED = False


class _Logger(logging.Logger):
    def success(self, msg, *args, **kwargs):
        if self.isEnabledFor(SUCCESS):
            self._log(SUCCESS, msg, args, **kwargs)


logging.setLoggerClass(_Logger)


def configure(level: int = logging.INFO, logfile: str | None = None) -> None:
    global _CONFIGURED
    root = logging.getLogger("maunet_tpu")
    root.setLevel(level)
    if not _CONFIGURED:
        fmt = logging.Formatter(
            "%(asctime)s | %(levelname)-8s | %(name)s - %(message)s",
            datefmt="%H:%M:%S")
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(fmt)
        root.addHandler(handler)
        if logfile:
            fh = logging.FileHandler(logfile)
            fh.setFormatter(fmt)
            root.addHandler(fh)
        root.propagate = False
        _CONFIGURED = True


def get_logger(name: str):
    configure()
    if not name.startswith("maunet_tpu"):
        name = f"maunet_tpu.{name}"
    return logging.getLogger(name)
