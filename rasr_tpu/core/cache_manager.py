"""Cluster cache-manager command resolution.

Re-creates src/Core/CacheManager.hh: path strings may embed
cache-manager commands enclosed in backticks, ```cf [-d] PATH```; the
command is resolved by invoking the external cache manager binary
(default ``cf``, override via $CACHE_MANAGER_PATH), whose stdout is the
staged local path.  Paths flagged ``-d`` are recorded and copied back to
their original location by copy_local_cache_files() — one write to the
shared filesystem per generated artifact.

Without a cache manager installed the original path is returned
unchanged (a warning is recorded), so configurations written for
cluster staging degrade gracefully on single machines.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
from typing import List, Tuple

_COMMAND = re.compile(r"`cf\s+([^`]*)`")

# (local staged path, original path) pairs pending copy-back
_pending: List[Tuple[str, str]] = []
warnings: List[str] = []


def _cache_manager_binary() -> str:
    return os.environ.get("CACHE_MANAGER_PATH", "cf")


def _run(args: List[str]) -> str:
    out = subprocess.run([_cache_manager_binary()] + args,
                         stdout=subprocess.PIPE, check=True)
    return out.stdout.decode("utf-8").rstrip("\n")


def resolve_cache_manager_commands(path: str) -> str:
    """Replace every `` `cf ...` `` span with the staged local path."""

    def repl(match: re.Match) -> str:
        args = match.group(1).split()
        copy_back = "-d" in args
        original = args[-1] if args else ""
        try:
            local = _run(args)
        except (OSError, subprocess.CalledProcessError) as exc:
            warnings.append(f"cache manager unavailable ({exc}); "
                            f"using {original} directly")
            return original
        if copy_back and local != original:
            _pending.append((local, original))
        return local

    return _COMMAND.sub(repl, path)


def copy_local_cache_files() -> int:
    """Copy '-d' staged files back to their original paths
    (Core::copyLocalCacheFiles); returns the number copied."""
    copied = 0
    while _pending:
        local, original = _pending.pop()
        if os.path.exists(local):
            os.makedirs(os.path.dirname(original) or ".", exist_ok=True)
            shutil.copy2(local, original)
            copied += 1
        else:
            warnings.append(f"staged file vanished: {local}")
    return copied
