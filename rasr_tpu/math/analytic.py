"""Analytic function factory.

Parses the reference's warping-function declaration language
(src/Math/AnalyticFunctionFactory.cc: `nest(f, g)`, `invert(f)`, `mel`,
`bark`, `disc-to-cont`, `equal-loudness-preemphasis`, `linear-2(a, b)`,
`constant(c)`, ...) into composable function objects with `value()`,
`invert()` and `derive()` — used by the filterbank and
continuous-transform Flow nodes (e.g. VTLN piecewise-linear warping
`nest(linear-2(1.2, 0.875), mel)`).

All functions evaluate on numpy arrays in float64.
"""

from __future__ import annotations

import math
import re
from typing import Callable, List, Optional

import numpy as np


class AnalyticFunction:
    def value(self, x):
        raise NotImplementedError

    def invert(self) -> Optional["AnalyticFunction"]:
        return None

    def derive(self) -> Optional["AnalyticFunction"]:
        return None

    def __call__(self, x):
        return self.value(np.asarray(x, dtype=np.float64))


class Identity(AnalyticFunction):
    def value(self, x):
        return np.asarray(x, dtype=np.float64)

    def invert(self):
        return self

    def derive(self):
        return Constant(1.0)


class Constant(AnalyticFunction):
    def __init__(self, c: float):
        self.c = float(c)

    def value(self, x):
        return np.full_like(np.asarray(x, dtype=np.float64), self.c)

    def derive(self):
        return Constant(0.0)


class Scaling(AnalyticFunction):
    def __init__(self, scale: float):
        self.scale = float(scale)

    def value(self, x):
        return self.scale * np.asarray(x, dtype=np.float64)

    def invert(self):
        return Scaling(1.0 / self.scale)

    def derive(self):
        return Constant(self.scale)


class Nest(AnalyticFunction):
    """nest(f, g)(x) = f(g(x))."""

    def __init__(self, f: AnalyticFunction, g: AnalyticFunction):
        self.f, self.g = f, g

    def value(self, x):
        return self.f.value(self.g.value(x))

    def invert(self):
        fi, gi = self.f.invert(), self.g.invert()
        if fi is None or gi is None:
            return None
        return Nest(gi, fi)

    def derive(self):
        fd, gd = self.f.derive(), self.g.derive()
        if fd is None or gd is None:
            return None
        outer = Nest(fd, self.g)

        class Product(AnalyticFunction):
            def __init__(self, a, b):
                self.a, self.b = a, b

            def value(self, x):
                return self.a.value(x) * self.b.value(x)

        return Product(outer, gd)


class MelWarping(AnalyticFunction):
    """f_mel = 2595 log10(1 + f/700) (src/Math/AcousticalAnalyticFunctions.hh:36)."""

    def value(self, x):
        return 2595.0 * np.log10(1.0 + np.asarray(x, np.float64) / 700.0)

    def invert(self):
        class Inv(AnalyticFunction):
            def value(self, m):
                return (np.power(10.0, np.asarray(m, np.float64) / 2595.0)
                        - 1.0) * 700.0

            def invert(self):
                return MelWarping()

        return Inv()

    def derive(self):
        class D(AnalyticFunction):
            def value(self, x):
                return 2595.0 / math.log(10.0) / (700.0 + np.asarray(x, np.float64))

        return D()


class BarkWarping(AnalyticFunction):
    """bark = 6 asinh(f / 600) (AnalyticFunctionFactory.cc:370)."""

    def value(self, x):
        return 6.0 * np.arcsinh(np.asarray(x, np.float64) / 600.0)

    def invert(self):
        class Inv(AnalyticFunction):
            def value(self, b):
                return 600.0 * np.sinh(np.asarray(b, np.float64) / 6.0)

            def invert(self):
                return BarkWarping()

        return Inv()

    def derive(self):
        class D(AnalyticFunction):
            def value(self, x):
                x = np.asarray(x, np.float64)
                return 6.0 / 600.0 / np.sqrt(1.0 + (x / 600.0) ** 2)

        return D()


class EqualLoudnessPreemphasis(AnalyticFunction):
    """E(f) per src/Math/AcousticalAnalyticFunctions.cc."""

    def value(self, f):
        omega2 = (2 * np.pi * np.asarray(f, np.float64)) ** 2
        omega4 = omega2 * omega2
        omega6 = omega4 * omega2
        return (omega4 * (omega2 + 56.8e6)) / (
            (omega2 + 6.3e6) ** 2 * (omega2 + 0.38e9) * (omega6 / 9.58e26 + 1))


class PiecewiseLinear2(AnalyticFunction):
    """linear-2(a, b): two-segment VTLN warping — slope a up to knee b
    (fraction of max argument), then the slope connecting to the endpoint
    (src/Math/AnalyticFunctionFactory.cc parseTwoPieceLinearFunction)."""

    def __init__(self, warping_factor: float, knee: float, max_arg: float = 1.0):
        self.a = float(warping_factor)
        self.knee = float(knee) * float(max_arg)
        self.max_arg = float(max_arg)

    def value(self, x):
        x = np.asarray(x, dtype=np.float64)
        y_knee = self.a * self.knee
        denom = max(self.max_arg - self.knee, 1e-30)
        slope2 = (self.max_arg - y_knee) / denom
        return np.where(x <= self.knee, self.a * x,
                        y_knee + slope2 * (x - self.knee))

    def invert(self):
        inv = PiecewiseLinear2(1.0, 0.0, self.max_arg)
        a, knee, max_arg = self.a, self.knee, self.max_arg

        class Inv(AnalyticFunction):
            def value(self, y):
                y = np.asarray(y, dtype=np.float64)
                y_knee = a * knee
                denom = max(max_arg - knee, 1e-30)
                slope2 = (max_arg - y_knee) / denom
                return np.where(y <= y_knee, y / max(a, 1e-30),
                                knee + (y - y_knee) / max(slope2, 1e-30))

        return Inv()


class AnalyticFunctionFactory:
    """Declaration parser (mirrors the reference factory interface)."""

    def __init__(self, sample_rate: float = 1.0, max_argument: float = 1.0):
        self.sample_rate = sample_rate
        self.max_argument = max_argument

    def create(self, declaration: str) -> AnalyticFunction:
        tokens = _tokenize(declaration)
        fn, pos = self._parse(tokens, 0)
        if pos != len(tokens):
            raise ValueError(f"trailing tokens in declaration: {declaration}")
        return fn

    def _parse(self, tokens: List[str], pos: int):
        name = tokens[pos]
        pos += 1
        if name == "nest":
            # declaration order: nest(g, f)(x) = f(g(x)) — the FIRST
            # argument is applied first, and the outer function parses with
            # max-argument mapped through g (reference parseNesting,
            # src/Math/AnalyticFunctionFactory.cc:161-180)
            assert tokens[pos] == "("
            g, pos = self._parse(tokens, pos + 1)
            assert tokens[pos] == ","
            saved = self.max_argument
            try:
                self.max_argument = float(g.value(np.asarray(saved)))
            except Exception:
                pass
            f, pos = self._parse(tokens, pos + 1)
            self.max_argument = saved
            assert tokens[pos] == ")"
            return Nest(f, g), pos + 1
        args: List = []
        if pos < len(tokens) and tokens[pos] == "(":
            pos += 1
            while tokens[pos] != ")":
                if tokens[pos] == ",":
                    pos += 1
                    continue
                if re.fullmatch(r"[-+0-9.eE]+", tokens[pos]):
                    args.append(float(tokens[pos]))
                    pos += 1
                else:
                    fn, pos = self._parse(tokens, pos)
                    args.append(fn)
            pos += 1
        if name == "invert":
            inv = args[0].invert()
            if inv is None:
                raise ValueError("function is not invertible")
            return inv, pos
        if name == "mel":
            return MelWarping(), pos
        if name == "bark":
            return BarkWarping(), pos
        if name == "equal-loudness-preemphasis":
            return EqualLoudnessPreemphasis(), pos
        if name == "disc-to-cont":
            return Scaling(1.0 / self.sample_rate), pos
        if name == "cont-to-disc":
            return Scaling(self.sample_rate), pos
        if name == "identity":
            return Identity(), pos
        if name == "constant":
            return Constant(args[0]), pos
        if name == "scaling":
            return Scaling(args[0]), pos
        if name == "linear-2":
            return PiecewiseLinear2(args[0], args[1], self.max_argument), pos
        raise ValueError(f"unknown analytic function {name!r}")


def _tokenize(text: str) -> List[str]:
    return re.findall(r"[A-Za-z][A-Za-z0-9-]*|[-+]?[0-9.]+(?:[eE][-+]?[0-9]+)?"
                      r"|[(),]", text)
