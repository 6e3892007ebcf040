"""Typed parameter declarations.

Mirrors the reference parameter family (src/Core/Parameter.hh:212-426):
Bool / Int / Float / String / Choice / vector-valued parameters, each with a
name, help text, default and optional range.  A parameter is *called* on a
Configuration to produce a typed value, or on a raw string to parse it.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from .configuration import Configuration


class Parameter:
    def __init__(self, name: str, help: str = "", default=None):
        self.name = name
        self.help = help
        self.default = default

    def parse(self, raw: str):
        raise NotImplementedError

    def match(self, name: str) -> bool:
        return name == self.name

    def __call__(self, source, default=None):
        if isinstance(source, Configuration):
            raw = source.get(self.name)
            if raw is None:
                return default if default is not None else self.default
            return self.parse(raw)
        return self.parse(str(source))


_TRUE = {"true", "yes", "on", "1"}
_FALSE = {"false", "no", "off", "0"}


class ParameterBool(Parameter):
    def __init__(self, name, help="", default=False):
        super().__init__(name, help, default)

    def parse(self, raw: str) -> bool:
        v = raw.strip().lower()
        if v in _TRUE:
            return True
        if v in _FALSE:
            return False
        raise ValueError(f"parameter {self.name}: bad boolean {raw!r}")


class ParameterInt(Parameter):
    def __init__(self, name, help="", default=0, minimum=None, maximum=None):
        super().__init__(name, help, default)
        self.minimum, self.maximum = minimum, maximum

    def parse(self, raw: str) -> int:
        v = int(float(raw))
        if self.minimum is not None and v < self.minimum:
            raise ValueError(f"parameter {self.name}: {v} < minimum {self.minimum}")
        if self.maximum is not None and v > self.maximum:
            raise ValueError(f"parameter {self.name}: {v} > maximum {self.maximum}")
        return v


class ParameterFloat(Parameter):
    def __init__(self, name, help="", default=0.0, minimum=None, maximum=None):
        super().__init__(name, help, default)
        self.minimum, self.maximum = minimum, maximum

    def parse(self, raw: str) -> float:
        v = float(raw)
        if self.minimum is not None and v < self.minimum:
            raise ValueError(f"parameter {self.name}: {v} < minimum {self.minimum}")
        if self.maximum is not None and v > self.maximum:
            raise ValueError(f"parameter {self.name}: {v} > maximum {self.maximum}")
        return v


class ParameterString(Parameter):
    def __init__(self, name, help="", default=""):
        super().__init__(name, help, default)

    def parse(self, raw: str) -> str:
        return raw


class Choice:
    """Named enumeration (src/Core/Choice.hh)."""

    def __init__(self, *pairs):
        self._by_name: Dict[str, int] = {}
        self._by_value: Dict[int, str] = {}
        for name, value in pairs:
            self._by_name[name] = value
            self._by_value.setdefault(value, name)

    def __getitem__(self, name: str) -> int:
        return self._by_name[name]

    def name_of(self, value: int) -> str:
        return self._by_value[value]

    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def names(self) -> List[str]:
        return list(self._by_name)


class ParameterChoice(Parameter):
    def __init__(self, name, choice: Choice, help="", default=None):
        super().__init__(name, help, default)
        self.choice = choice

    def parse(self, raw: str):
        raw = raw.strip()
        if raw not in self.choice:
            raise ValueError(
                f"parameter {self.name}: {raw!r} not one of {self.choice.names()}")
        return self.choice[raw]


def _split_vector(raw: str) -> List[str]:
    # reference vector parameters accept whitespace-separated values
    return raw.replace(",", " ").split()


class ParameterIntVector(Parameter):
    def __init__(self, name, help="", default=()):
        super().__init__(name, help, list(default))

    def parse(self, raw: str) -> List[int]:
        return [int(x) for x in _split_vector(raw)]


class ParameterFloatVector(Parameter):
    def __init__(self, name, help="", default=()):
        super().__init__(name, help, list(default))

    def parse(self, raw: str) -> List[float]:
        return [float(x) for x in _split_vector(raw)]


class ParameterStringVector(Parameter):
    def __init__(self, name, help="", default=(), separator=None):
        super().__init__(name, help, list(default))
        self.separator = separator

    def parse(self, raw: str) -> List[str]:
        if self.separator:
            return [s for s in raw.split(self.separator) if s]
        return raw.split()


class ParameterBitVector(Parameter):
    """Set of enabled indices given as e.g. '0:3,7' (src/Core/Parameter.hh)."""

    def __init__(self, name, help="", default=()):
        super().__init__(name, help, set(default))

    def parse(self, raw: str) -> set:
        out = set()
        for part in raw.split(","):
            part = part.strip()
            if not part:
                continue
            if ":" in part:
                a, b = part.split(":", 1)
                out.update(range(int(a), int(b) + 1))
            else:
                out.add(int(part))
        return out
