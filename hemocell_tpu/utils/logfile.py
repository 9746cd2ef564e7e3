"""Tee logging: stdout + versioned logfile.

Equivalent of the reference's ``hlog`` / ``hlogfile`` streams
(config/logfile.h:30-75): ``hlog`` writes to stdout and the logfile,
``hlogfile`` to the file only; the log directory gets a versioned file name
(logfile, logfile.1, ...) like the reference's loadDirectories.
"""

from __future__ import annotations

import os
import sys
from typing import Optional


class Logger:
    def __init__(self):
        self._fh: Optional[object] = None
        self.path: Optional[str] = None

    def open(self, log_dir: str, name: str = "logfile") -> str:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, name)
        version = 0
        while os.path.exists(path):
            version += 1
            path = os.path.join(log_dir, f"{name}.{version}")
        self._fh = open(path, "w")
        self.path = path
        return path

    def log(self, *parts, stdout: bool = True):
        msg = " ".join(str(p) for p in parts)
        if stdout:
            print(msg)
        if self._fh is not None:
            self._fh.write(msg + "\n")
            self._fh.flush()

    def file_only(self, *parts):
        self.log(*parts, stdout=False)

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


#: module-level logger, mirroring the reference's global hlog
hlog = Logger()


def log(*parts):
    hlog.log(*parts)


def logfile_only(*parts):
    hlog.file_only(*parts)


_header_printed = False


def print_header():
    """Startup banner (reference: printHeader,
    helper/genericFunctions.cpp:121-129) — original art, TPU edition.
    Printed once per process."""
    global _header_printed
    if _header_printed:
        return
    _header_printed = True
    from .. import __version__

    for line in (
        r" _                               _ _      _              ",
        r"| |_  ___ _____ ___  ___ ___ _ _| | |    | |_ ___ _ _    ",
        r"|   \/ -_)     / _ \/ __/ -_) | | | |  _ |  _| . | | |   ",
        r"|_|_|\___|_|_|_\___/\__|\___|_|_|_|_| (_)|_| |  _|___|   ",
        r"                                             |_|         ",
        f"        hemocell_tpu v{__version__} (JAX/XLA/Pallas)",
        "",
    ):
        hlog.log(line)
