"""Verbosity-gated console logger with section timing.

Own implementation of the logging UX the reference provides
(auxiliary.py:29-344): 4 verbosity levels, indentation, bold section headers
with cumulative + delta wall time, platform/device/memory reports. The device
report here is JAX-native (backend, device kind, chip count) instead of the
reference's TF/CUDA report (auxiliary.py:202-271).
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timedelta
from pathlib import Path

import click

from orcai_tpu.utils.jsonenc import JsonEncoderExt

ERROR, WARNING, INFO, DEBUG = 0, 1, 2, 3


class Messenger:
    """Prints messages gated by verbosity with indent tracking and part timers."""

    def __init__(
        self,
        title: str | None = None,
        n_indent: int = 0,
        verbosity: int = 2,
        indent_str: str = "    ",
        show_part_times: bool = True,
        file: Path | None = None,
    ):
        self.n_indent = n_indent
        self.verbosity = verbosity
        self.indent_str = indent_str
        self.show_part_times = show_part_times
        self.file = file
        self._t0 = time.time()
        self._last_part: float | None = None
        if title is not None:
            self.start(title)

    # -- core ---------------------------------------------------------------

    def _fmt(self, message) -> str:
        # late import: pandas is heavy and not always needed
        try:
            import pandas as pd

            if isinstance(message, (pd.DataFrame, pd.Series)):
                text = message.to_string()
                return "\n".join(
                    self.indent_str * self.n_indent + line
                    for line in text.splitlines()
                )
        except ImportError:  # pragma: no cover
            pass
        if isinstance(message, dict):
            text = json.dumps(message, indent=4, cls=JsonEncoderExt)
            return "\n".join(
                self.indent_str * self.n_indent + line for line in text.splitlines()
            )
        if isinstance(message, (list, tuple)):
            return "\n".join(
                self.indent_str * self.n_indent + str(line) for line in message
            )
        return str(message)

    def print(
        self,
        message,
        indent: int = 0,
        set_indent: int | None = None,
        prepend: str = "",
        severity: int = INFO,
        **style,
    ):
        if self.verbosity < severity:
            return
        if set_indent is not None:
            self.n_indent = set_indent
        if isinstance(message, str):
            text = self.indent_str * self.n_indent + prepend + message
        else:
            # _fmt already applies the indentation; only insert the severity
            # marker after the first line's pad
            text = self._fmt(message)
            if prepend:
                pad = self.indent_str * self.n_indent
                if text.startswith(pad):
                    text = pad + prepend + text[len(pad):]
                else:
                    text = prepend + text
        click.echo(click.style(text, **style), file=self.file)
        self.n_indent += indent

    # -- levels ---------------------------------------------------------------

    def debug(self, message, indent=0, set_indent=None, severity=DEBUG, **kw):
        self.print(message, indent, set_indent, severity=severity, **kw)

    def info(self, message, indent=0, set_indent=None, severity=INFO, **kw):
        self.print(message, indent, set_indent, severity=severity, **kw)

    def warning(self, message, indent=0, set_indent=None, severity=WARNING, **kw):
        self.print(
            message, indent, set_indent, prepend="‼️ ", severity=severity,
            fg="yellow", **kw,
        )

    def error(self, message, indent=0, set_indent=None, severity=ERROR, **kw):
        self.print(
            message, indent, set_indent, prepend="❌ ", severity=severity,
            fg="red", **kw,
        )

    # -- sections -------------------------------------------------------------

    def start(self, message, indent=0, set_indent=0, severity=INFO, **kw):
        self.print(message, indent, set_indent, prepend="🐳 ", severity=severity,
                   bold=True, **kw)
        if self.verbosity >= severity:
            from orcai_tpu import __version__

            self.print(
                f"orcAI-TPU {__version__} "
                f"[started @ {datetime.now().strftime('%Y-%m-%d %H:%M:%S')}]",
                indent, set_indent, severity=severity, italic=True, **kw,
            )

    def part(self, message, indent=1, set_indent=0, severity=INFO, **kw):
        now = time.time()
        if self.show_part_times:
            total = timedelta(seconds=round(now - self._t0))
            delta = (
                f", 𝚫 {timedelta(seconds=round(now - self._last_part))}"
                if self._last_part is not None
                else ""
            )
            message = f"{message} [{total}{delta}]"
        self._last_part = now
        self.print(message, indent, set_indent, prepend="🐳 ", severity=severity,
                   bold=True, **kw)

    def success(self, message, indent=0, set_indent=0, severity=INFO, **kw):
        self.part(message, indent, set_indent, severity=severity, fg="green", **kw)

    # -- reports ----------------------------------------------------------------

    def print_platform_info(self, severity=INFO, **kw):
        if self.verbosity < severity:
            return
        import platform
        import sys

        import jax

        self.info(f"Platform: {platform.platform()}", severity=severity, italic=True, **kw)
        self.info(f"Python version: {sys.version}", severity=severity, italic=True, **kw)
        self.info(f"JAX version: {jax.__version__}", severity=severity, italic=True, **kw)

    def print_device_info(self, indent=0, set_indent=None, severity=INFO, **kw):
        if self.verbosity < severity:
            return
        import jax

        devices = jax.devices()
        desc = ", ".join(f"{d.id}: {d.device_kind}" for d in devices)
        self.info(
            f"JAX backend: {jax.default_backend()} ({len(devices)} devices) [{desc}]",
            indent=indent, set_indent=set_indent, severity=severity, italic=True, **kw,
        )

    def print_memory_usage(self, indent=0, set_indent=None, severity=INFO, **kw):
        if self.verbosity < severity:
            return
        from humanize import naturalsize
        from psutil import Process

        rss = Process(os.getpid()).memory_info().rss
        self.info(
            f"memory usage: {naturalsize(rss, format='%.2f')}",
            indent=indent, set_indent=set_indent, severity=severity, italic=True, **kw,
        )

    def print_file_size(self, file: Path, indent=0, set_indent=None, severity=INFO, **kw):
        if self.verbosity < severity:
            return
        from humanize import naturalsize

        size = Path(file).stat().st_size
        self.info(
            f"Size on disk of {Path(file).name}: {naturalsize(size, format='%.2f')}",
            indent=indent, set_indent=set_indent, severity=severity, **kw,
        )

    def print_directory_size(self, directory: Path, indent=0, set_indent=None,
                             severity=INFO, **kw):
        if self.verbosity < severity:
            return
        from humanize import naturalsize

        total = sum(f.stat().st_size for f in Path(directory).rglob("*") if f.is_file())
        self.info(
            f"Size on disk of {Path(directory).stem}: {naturalsize(total, format='%.2f')}",
            indent=indent, set_indent=set_indent, severity=severity, **kw,
        )
