"""Component base class.

Every configurable object derives from Component: it owns a configuration
selection and log/warning/error channels (reference: src/Core/Component.hh:71,
src/Core/Configurable.hh:32).
"""

from __future__ import annotations

from typing import Optional

from .channel import Channel
from .configuration import Configuration


class ComponentError(Exception):
    pass


class Component:
    def __init__(self, config: Configuration):
        self.config = config
        self._log = Channel(config, "log", default="stdout")
        self._warning = Channel(config, "warning", default="stderr")
        self._error = Channel(config, "error", default="stderr")

    @property
    def name(self) -> str:
        return self.config.name

    @property
    def full_name(self) -> str:
        return self.config.selection

    def select(self, name: str) -> Configuration:
        return self.config.sub(name)

    def log(self, message: str, *args) -> None:
        if args:
            message = message % args
        self._log.write(f"<log component={self.full_name!r}> {message}\n")

    def warning(self, message: str, *args) -> None:
        if args:
            message = message % args
        self._warning.write(f"<warning component={self.full_name!r}> {message}\n")

    def error(self, message: str, *args) -> None:
        if args:
            message = message % args
        self._error.write(f"<error component={self.full_name!r}> {message}\n")
        raise ComponentError(f"{self.full_name}: {message}")

    def critical_error(self, message: str, *args) -> None:
        self.error(message, *args)
