"""Application framework.

Mirrors the reference application bootstrap (src/Core/Application.hh:71,117,
254): an Application owns the root Configuration, parses the command line /
environment / config files, sets up logging and exposes `run()` for tool
entry points.  The first configuration selector is the application name.
"""

from __future__ import annotations

import sys
import time
import traceback
from typing import List, Optional, Sequence

from .channel import ChannelManager
from .component import Component
from .configuration import Configuration


class Application(Component):
    def __init__(self, name: str, argv: Optional[Sequence[str]] = None):
        config = Configuration(name=name)
        config.set_from_environment()
        self._unparsed: List[str] = config.set_from_command_line(
            list(argv if argv is not None else sys.argv[1:]))
        super().__init__(config)
        self._start_time = time.time()
        self._setup_compilation_cache()

    def _setup_compilation_cache(self) -> None:
        """Persistent XLA compilation cache — the TPU-native equivalent of
        the reference's MappedArchive image caches (state trees / lookahead
        tables survived process restarts; here compiled executables do).
        Configured via `*.compilation-cache.path` or JAX defaults."""
        path = self.config.sub("compilation-cache").get("path")
        if path:
            try:
                import jax
                jax.config.update("jax_compilation_cache_dir", path)
                jax.config.update("jax_persistent_cache_min_compile_time_secs",
                                  0.5)
            except Exception as exc:  # cache is an optimization, never fatal
                self.warning("compilation cache setup failed: %s", exc)

    @property
    def arguments(self) -> List[str]:
        return self._unparsed

    def run(self) -> int:
        raise NotImplementedError

    def log_resource_usage(self) -> None:
        """Peak RSS + CPU time at exit (Application::logResourceUsage,
        src/Core/Application.hh:102-104)."""
        from .resources import format_resource_usage
        elapsed = time.time() - self._start_time
        self.log("resource usage: %s elapsed %.1fs",
                 format_resource_usage(), elapsed)

    def main(self) -> int:
        try:
            status = self.run() or 0
        except Exception:
            traceback.print_exc()
            status = 1
        finally:
            if self.config.get("log-resource-usage", "") in ("true", "yes",
                                                             "1", "on"):
                self.log_resource_usage()
            ChannelManager.instance().flush_all()
        return status


def application(cls):
    """Decorator turning an Application subclass into a script entry point
    (the reference's APPLICATION() macro, src/Core/Application.hh:269-277)."""
    if cls.__module__ == "__main__":
        sys.exit(cls().main())
    return cls
