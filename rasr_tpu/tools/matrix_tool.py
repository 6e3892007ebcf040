"""matrix-tool: inspect and transform matrix/vector files
(reference: src/Tools/Math/MatrixTool.cc — read/write/scale/add/
max/l2norm/expand/submatrix actions over the matrix IO formats).

Usage (actions chain left to right on the loaded matrix):
    python -m rasr_tpu.tools.matrix_tool read <in> [action args]...

Actions:
    info                      print shape / dtype / norms
    scale <factor>            multiply by scalar
    add <file>                add another matrix
    multiply <file>           right-multiply by another matrix
    transpose
    expand <rows> <cols>      zero-pad to shape
    submatrix <r0> <r1> <c0> <c1>
    max | l2norm              print statistic
    write <out>               write the current matrix
"""

from __future__ import annotations

import sys
from typing import List, Optional

import numpy as np

from ..math.matrix_io import read_matrix, write_matrix


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2 or argv[0] != "read":
        print(__doc__)
        return 1
    m = read_matrix(argv[1])
    i = 2
    while i < len(argv):
        op = argv[i]
        if op == "info":
            print(f"shape: {m.shape}  dtype: {m.dtype}")
            print(f"abs-max: {np.abs(m).max():.6g}  "
                  f"l2norm: {np.linalg.norm(m):.6g}")
            i += 1
        elif op == "scale":
            m = m * float(argv[i + 1])
            i += 2
        elif op == "add":
            m = m + read_matrix(argv[i + 1])
            i += 2
        elif op == "multiply":
            m = m @ read_matrix(argv[i + 1])
            i += 2
        elif op == "transpose":
            m = m.T
            i += 1
        elif op == "expand":
            r, c = int(argv[i + 1]), int(argv[i + 2])
            out = np.zeros((r, c), dtype=m.dtype)
            out[:m.shape[0], :m.shape[1]] = m
            m = out
            i += 3
        elif op == "submatrix":
            r0, r1, c0, c1 = (int(x) for x in argv[i + 1:i + 5])
            m = m[r0:r1, c0:c1]
            i += 5
        elif op == "max":
            print(f"{np.abs(m).max():.6g}")
            i += 1
        elif op == "l2norm":
            print(f"{np.linalg.norm(m):.6g}")
            i += 1
        elif op == "write":
            write_matrix(argv[i + 1], m)
            i += 2
        else:
            print(f"unknown action {op!r}")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
