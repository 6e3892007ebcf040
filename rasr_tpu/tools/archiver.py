"""archiver tool: inspect / extract / combine cache archives
(reference: src/Tools/Archiver/Archiver.cc:117).

Usage:
    python -m rasr_tpu.tools.archiver list <archive>
    python -m rasr_tpu.tools.archiver show <archive> <item>     # features
    python -m rasr_tpu.tools.archiver copy <src>... <dst>       # combine
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.archive import FileArchive, open_archive
from ..speech.feature_cache import unpack_features


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1
    cmd = argv[0]
    if cmd == "list":
        with open_archive(argv[1]) as ar:
            for k in sorted(ar.keys()):
                print(k)
    elif cmd == "show":
        with open_archive(argv[1]) as ar:
            data = ar.read(argv[2])
        try:
            feats, starts, ends = unpack_features(data)
            print(f"# {argv[2]}: {feats.shape[0]} frames x {feats.shape[1]} dims")
            for t in range(len(feats)):
                vals = " ".join(f"{v:.6f}" for v in feats[t])
                print(f"{starts[t]:.3f} {ends[t]:.3f} {vals}")
        except Exception:
            sys.stdout.buffer.write(data)
    elif cmd == "copy":
        srcs, dst = argv[1:-1], argv[-1]
        with FileArchive(dst, "w") as out:
            for src in srcs:
                with open_archive(src) as ar:
                    for k in ar.keys():
                        out.write(k, ar.read(k))
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
