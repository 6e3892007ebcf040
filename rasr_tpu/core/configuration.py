"""Hierarchical configuration system.

Re-implements the semantics of the reference configuration database
(reference: src/Core/Configuration.hh:90, src/Core/Configuration.cc,
doc/configuration.rst):

  * resources are ``selector.path.name = value`` pairs where any selector
    component may be the wildcard ``*`` matching any (possibly empty)
    sequence of components,
  * lookups return the *most specific* match (largest number of literal
    components matched, computed by the same DP as
    src/Core/Configuration.cc:38 Resource::match),
  * values may contain context-dependent references ``$(selector)`` and
    arithmetic expressions ``$[expr]`` / ``$[expr,format]``,
  * config files support ``[group.selector]`` headers, ``include`` directives
    and ``#`` comments; resources also come from the command line
    (``--a.b.c=v``) and the environment.
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

_WILDCARD = "*"
_SEP = "."


@dataclass(frozen=True)
class Resource:
    key: str
    value: str
    components: Tuple[str, ...] = field(init=False)

    def __post_init__(self):
        object.__setattr__(self, "components", tuple(self.key.split(_SEP)))

    def match(self, components: Sequence[str]) -> int:
        """Number of literal components matched, or -1 when not matching.

        DP over (resource component, query position); wildcard matches any
        possibly-empty run of query components.  Mirrors
        src/Core/Configuration.cc:38.
        """
        NEG = -(1 << 30)
        n = len(components)
        scores = [NEG] * (n + 1)
        scores[0] = 0
        for rc in self.components:
            if rc == _WILDCARD:
                # wildcard: propagate best score forward over any span
                best = NEG
                for i in range(n + 1):
                    if scores[i] > best:
                        best = scores[i]
                    elif best > scores[i]:
                        scores[i] = best
            else:
                # literal: must consume exactly one query component
                new = [NEG] * (n + 1)
                for i in range(n):
                    if scores[i] >= 0 and components[i] == rc:
                        new[i + 1] = scores[i] + 1
                scores = new
        return scores[n] if scores[n] >= 0 else -1


class ConfigurationError(Exception):
    pass


_REF_RE = re.compile(r"\$\(([^()]*)\)")
_ARITH_OPEN = "$["


class Configuration:
    """Global resource database + a current selection path.

    A `Configuration` instance is a *view* of the shared database under a
    selection prefix (like the reference's copy-constructor with added
    selection, src/Core/Configuration.hh:300).
    """

    def __init__(self, parent: Optional["Configuration"] = None, name: str = ""):
        if parent is None:
            self._db: Dict[str, Resource] = {}
            self._selection: Tuple[str, ...] = (name,) if name else ()
        else:
            self._db = parent._db
            self._selection = parent._selection + ((name,) if name else ())

    # -- construction -----------------------------------------------------

    def sub(self, name: str) -> "Configuration":
        """A sub-configuration with `name` appended to the selection."""
        return Configuration(self, name)

    @property
    def selection(self) -> str:
        return _SEP.join(self._selection)

    @property
    def name(self) -> str:
        return self._selection[-1] if self._selection else ""

    # -- resource entry ---------------------------------------------------

    def set(self, key: str, value) -> None:
        key = key.strip()
        if not key:
            raise ConfigurationError("empty resource key")
        self._db[key] = Resource(key, str(value))

    def set_from_file(self, path: str, group: str = "") -> None:
        self._read_config_file(path, group)

    def set_from_command_line(self, argv: Sequence[str]) -> List[str]:
        """Consume ``--key=value`` / ``--key value`` args; returns leftovers."""
        rest: List[str] = []
        i = 0
        argv = list(argv)
        while i < len(argv):
            arg = argv[i]
            if arg.startswith("--config="):
                self.set_from_file(arg.split("=", 1)[1])
            elif arg == "--config" and i + 1 < len(argv):
                i += 1
                self.set_from_file(argv[i])
            elif arg.startswith("--") and "=" in arg:
                key, value = arg[2:].split("=", 1)
                self.set(key, value)
            else:
                rest.append(arg)
            i += 1
        return rest

    def set_from_environment(self, variable: str = "RASR_CONFIG") -> None:
        blob = os.environ.get(variable, "")
        for part in blob.split(";"):
            part = part.strip()
            if part and "=" in part:
                key, value = part.split("=", 1)
                self.set(key.strip(), value.strip())

    def _read_config_file(self, path: str, group: str = "") -> None:
        if not os.path.exists(path):
            raise ConfigurationError(f"config file not found: {path}")
        current_group = group
        with open(path, "r", encoding="utf-8") as fh:
            for raw in fh:
                line = raw.split("#", 1)[0].strip()
                if not line:
                    continue
                if line.startswith("[") and line.endswith("]"):
                    current_group = line[1:-1].strip()
                    continue
                if line.startswith("include"):
                    inc = line[len("include"):].strip()
                    inc_path = inc if os.path.isabs(inc) else os.path.join(
                        os.path.dirname(os.path.abspath(path)), inc)
                    self._read_config_file(inc_path, current_group)
                    continue
                if "=" not in line:
                    raise ConfigurationError(
                        f"malformed config line in {path}: {raw.rstrip()}")
                key, value = (x.strip() for x in line.split("=", 1))
                full = f"{current_group}.{key}" if current_group else key
                self.set(full, value)

    # -- lookup -----------------------------------------------------------

    def _find(self, parameter_path: str) -> Optional[Resource]:
        components = parameter_path.split(_SEP)
        best: Optional[Resource] = None
        best_score = 0  # score-0 (all-wildcard) matches never win, as in reference
        for res in self._db.values():
            m = res.match(components)
            if m > best_score:
                best, best_score = res, m
            elif m == best_score and best is not None and m > 0:
                # tie: keep deterministic order (lexicographically smaller key)
                if res.key < best.key:
                    best = res
        return best

    def get_raw(self, name: str) -> Optional[str]:
        """Raw resource value for parameter `name` under this selection."""
        path = f"{self.selection}.{name}" if self._selection else name
        res = self._find(path)
        return res.value if res is not None else None

    def get(self, name: str, default: Optional[str] = None) -> Optional[str]:
        """Resolved (references + arithmetic) value for parameter `name`."""
        path = f"{self.selection}.{name}" if self._selection else name
        res = self._find(path)
        if res is None:
            return default
        return self._resolve(res.value, path)

    def resolve_string(self, value: str) -> str:
        """Resolve references/arithmetic in an arbitrary string in this context."""
        path = self.selection if self._selection else ""
        return self._resolve(value, path)

    # -- reference / arithmetic resolution ---------------------------------

    def _resolve(self, value: str, context_path: str, depth: int = 0) -> str:
        if depth > 20:
            raise ConfigurationError(f"circular reference resolving: {value}")
        out = value
        # innermost-first arithmetic so nested $( ) inside $[ ] resolve first
        changed = True
        while changed:
            changed = False
            m = _REF_RE.search(out)
            if m:
                ref = m.group(1)
                out = out[:m.start()] + self._resolve_reference(
                    ref, context_path, depth) + out[m.end():]
                changed = True
                continue
            idx = out.find(_ARITH_OPEN)
            if idx >= 0:
                end = self._matching_bracket(out, idx + 1)
                inner = out[idx + 2:end]
                out = out[:idx] + self._eval_arithmetic(inner) + out[end + 1:]
                changed = True
        return out

    @staticmethod
    def _matching_bracket(s: str, open_idx: int) -> int:
        depth = 0
        for i in range(open_idx, len(s)):
            if s[i] == "[":
                depth += 1
            elif s[i] == "]":
                depth -= 1
                if depth == 0:
                    return i
        raise ConfigurationError(f"unbalanced $[ ] in: {s}")

    def _resolve_reference(self, ref: str, context_path: str, depth: int) -> str:
        """Context-dependent `$(ref)` resolution.

        Append `ref` to the matched parameter path; iteratively truncate the
        path until a match is found (doc/configuration.rst References).
        """
        if _ARITH_OPEN in ref:
            # arithmetic nested inside the reference name, e.g. $(cmp-$[...])
            ref = self._resolve(ref, context_path, depth + 1)
        parts = context_path.split(_SEP) if context_path else []
        # drop the parameter name itself first, then truncate further
        for cut in range(len(parts) - 1, -2, -1):
            prefix = parts[:max(cut, 0)]
            candidate = _SEP.join(prefix + [ref]) if prefix else ref
            res = self._find(candidate)
            if res is not None:
                return self._resolve(res.value, candidate, depth + 1)
        raise ConfigurationError(
            f"cannot resolve reference $({ref}) in context {context_path}")

    _EVAL_NAMES = {
        "log": math.log, "log2": math.log2, "log10": math.log10,
        "exp": math.exp, "sqrt": math.sqrt, "pow": math.pow,
        "sin": math.sin, "cos": math.cos, "tan": math.tan,
        "floor": math.floor, "ceil": math.ceil, "abs": abs,
        "min": min, "max": max, "pi": math.pi, "e": math.e,
        "round": round, "int": int, "float": float,
    }

    def _eval_arithmetic(self, expr: str) -> str:
        fmt = None
        # trailing ",int" / ",float" format qualifier
        m = re.search(r",\s*(int|float)\s*$", expr)
        if m:
            fmt = m.group(1)
            expr = expr[:m.start()]
        try:
            result = eval(  # noqa: S307 - restricted namespace, config-owned input
                compile(expr.strip(), "<config-arith>", "eval"),
                {"__builtins__": {}}, dict(self._EVAL_NAMES))
        except Exception as exc:
            raise ConfigurationError(f"bad arithmetic expression $[{expr}]: {exc}")
        if fmt == "int":
            return str(int(result))
        if fmt == "float":
            return repr(float(result))
        if isinstance(result, float) and result.is_integer():
            return str(int(result))
        return str(result)

    # -- introspection ------------------------------------------------------

    def resources(self) -> Dict[str, str]:
        return {k: r.value for k, r in sorted(self._db.items())}

    def __repr__(self):
        return f"Configuration(selection={self.selection!r}, resources={len(self._db)})"
