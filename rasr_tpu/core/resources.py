"""Process resource usage and assertion helpers.

Reference: src/Core/MemoryInfo.cc / ResourceUsageInfo.cc (peak RSS,
user/system CPU time logged by Application::logResourceUsage,
src/Core/Application.hh:102-104) and the require/verify/defect
assertion macros (src/Core/Assertions.hh) that abort with source
context."""

from __future__ import annotations

import os
import resource
import time
from typing import Dict, Optional


def memory_info() -> Dict[str, int]:
    """Current/peak memory of this process in bytes (MemoryInfo.cc:
    VmSize/VmRSS/peak from /proc/self/status, rusage fallback)."""
    out: Dict[str, int] = {}
    try:
        with open("/proc/self/status", "r", encoding="ascii") as fh:
            for line in fh:
                if line.startswith(("VmSize:", "VmRSS:", "VmPeak:",
                                    "VmHWM:")):
                    key, val = line.split(":", 1)
                    out[key.lower()] = int(val.split()[0]) * 1024
    except OSError:
        pass
    ru = resource.getrusage(resource.RUSAGE_SELF)
    out.setdefault("vmhwm", ru.ru_maxrss * 1024)  # peak RSS
    return out


def resource_usage() -> Dict[str, float]:
    """User/system CPU seconds + peak RSS (ResourceUsageInfo.cc)."""
    ru = resource.getrusage(resource.RUSAGE_SELF)
    return {
        "user-cpu-s": ru.ru_utime,
        "system-cpu-s": ru.ru_stime,
        "peak-rss-bytes": ru.ru_maxrss * 1024,
        "wall-clock-s": time.monotonic(),
    }


def format_resource_usage() -> str:
    u = resource_usage()
    m = memory_info()
    rss = m.get("vmrss", 0) / 1e6
    peak = m.get("vmhwm", u["peak-rss-bytes"]) / 1e6
    return (f"user {u['user-cpu-s']:.1f}s system {u['system-cpu-s']:.1f}s "
            f"rss {rss:.0f}MB peak {peak:.0f}MB")


# -- assertions (Core/Assertions.hh require/verify/defect) -----------------

class AssertionFailure(AssertionError):
    pass


def _fail(kind: str, message: Optional[str]) -> None:
    import traceback
    frame = traceback.extract_stack(limit=3)[0]
    loc = f"{os.path.basename(frame.filename)}:{frame.lineno}"
    raise AssertionFailure(
        f"{kind} failed at {loc}" + (f": {message}" if message else ""))


def require(condition, message: Optional[str] = None) -> None:
    """Precondition check (active in all builds, Assertions.hh)."""
    if not condition:
        _fail("require", message)


def verify(condition, message: Optional[str] = None) -> None:
    """Internal-consistency check."""
    if not condition:
        _fail("verify", message)


def defect(message: str = "reached defective code path") -> None:
    """Marks unreachable/defective code (Assertions.hh defect())."""
    _fail("defect", message)
