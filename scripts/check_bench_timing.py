"""One-off: validate bench.py's timing methodology on the live tunnel.

Compares three ways of timing the same 5-iteration decode loop:
  A. block_until_ready on the last output (bench.py today);
  B. one scalar fetch of the last output (forces real completion since
     single-device dispatches execute in order);
  C. per-iteration scalar fetch (upper bound incl. 5 RPC round trips).

If A << B the block_until_ready sync is returning early and bench.py
overreports throughput; B is then the honest timer.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    (task, model, params, trained, pipe, decode, T_feat, N,
     _df, _lp, _lmm, _stages) = bench.setup("")
    ev_batch = 32
    wer, greedy_wer, pad, flens, _o = bench.eval_wer(
        task, pipe, decode, params, T_feat, N, ev_batch)
    batch = 256
    rng = np.random.default_rng(0)
    reps = rng.integers(0, ev_batch, size=batch)
    big = jnp.asarray(pad[reps])
    big_lens = flens[jnp.asarray(reps)]
    out = decode(params, big, big_lens)
    _ = float(jnp.sum(out[2]))           # warm + real sync
    iters = 5
    audio = iters * batch * bench.SECONDS

    def run_a():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = decode(params, big, big_lens)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    def run_b():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = decode(params, big, big_lens)
        _ = float(jnp.sum(out[2]))
        return time.perf_counter() - t0

    def run_c():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = decode(params, big, big_lens)
            _ = float(jnp.sum(out[2]))
        return time.perf_counter() - t0

    res = {}
    for name, fn in (("block_until_ready", run_a),
                     ("final_scalar_fetch", run_b),
                     ("per_iter_scalar_fetch", run_c)):
        dts = [fn() for _ in range(3)]
        res[name] = {"dt_min_s": round(min(dts), 3),
                     "x_realtime": round(audio / min(dts), 1),
                     "all_s": [round(d, 3) for d in dts]}
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
