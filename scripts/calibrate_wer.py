"""Calibrate the bench's hard eval condition on the real chip.

Sweeps babble SNR (and optionally warp range) over the flagship decode
and prints greedy/beam WER per condition so bench.py's EVAL_CONDITION
can be pinned at a nonzero (2-10%) operating point.

Usage:  python scripts/calibrate_wer.py [snr_db ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    snrs = [float(a) for a in sys.argv[1:]] or [None, 20.0, 15.0, 10.0,
                                                8.0, 5.0, 3.0, 0.0]
    (task, model, params, trained, pipe, decode, T_feat, N,
     _df, _lp, _lmm, _stages) = bench.setup()
    print(f"flagship trained={trained}")
    for snr in snrs:
        for warp in [(0.92, 1.08)] if snr is not None else [(0.96, 1.04)]:
            cond = dict(snr_db=snr, noise="babble", warp_range=warp)
            wer, greedy_wer, _, _, _o = bench.eval_wer(
                task, pipe, decode, params, T_feat, N, ev_batch=32,
                condition=cond)
            print(f"snr={snr} warp={warp}: beam WER={wer:.4f} "
                  f"greedy WER={greedy_wer:.4f}", flush=True)


if __name__ == "__main__":
    main()
