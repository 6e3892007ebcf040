"""ctypes bindings for the native beam-search kernel (native/rasr_beam.cpp).

The reference's time-synchronous expansion loop is C++
(src/Search/AdvancedTreeSearch/SearchSpace.cc expandHmm ->
pruneAndAddScores over SoA hypothesis arrays,
SearchSpaceHelpers.hh:84); this is the equivalent native runtime for
`search.hmm_timesync.WordConditionedTreeSearch`: one call per frame
fuses move/entry generation, emission scoring, (state, history)
recombination and threshold+histogram pruning.  Falls back to the
vectorized numpy implementation when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from ..speech.native_io import _ensure_built

# pointer args are declared c_void_p and passed as raw addresses
# (ndarray.ctypes.data): per-frame data_as()/cast() marshaling was ~25%
# of the steady-state host loop at 100k-word scale
_I64P = ctypes.c_void_p
_F64P = ctypes.c_void_p
_F32P = ctypes.c_void_p
_U8P = ctypes.c_void_p


def _lib() -> Optional[ctypes.CDLL]:
    lib = _ensure_built()
    if lib is None:
        return None
    if not getattr(lib, "_beam_ready", False):
        lib.rasr_beam_net_create.restype = ctypes.c_void_p
        lib.rasr_beam_net_create.argtypes = [
            ctypes.c_int64, _U8P, _U8P, _U8P, _F64P, _F64P, _F64P,
            _I64P, _I64P, ctypes.c_int64, _I64P, _I64P]
        lib.rasr_beam_net_free.argtypes = [ctypes.c_void_p]
        lib.rasr_beam_expand.restype = ctypes.c_int64
        lib.rasr_beam_expand.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64, _I64P, _I64P, _F64P, _I64P, _I64P, _F64P,
            ctypes.c_int64, _I64P, _I64P, _F64P, _I64P, _I64P, _F64P,
            ctypes.c_int64, _I64P, _I64P, _F64P, _I64P, _I64P, _F64P,
            _F64P, _F64P, ctypes.c_double,
            _F32P, _I64P, _I64P, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
            _I64P, _I64P, _F64P, _I64P, _I64P, _F64P, _I64P]
        lib._beam_ready = True
    return lib


def _i64(a) -> np.ndarray:
    return np.ascontiguousarray(a, np.int64)


def _f64(a) -> np.ndarray:
    return np.ascontiguousarray(a, np.float64)


def _pi(a: np.ndarray):
    return a.ctypes.data


def _pf(a: np.ndarray):
    return a.ctypes.data


_EMPTY_I = np.zeros(0, np.int64)
_EMPTY_F = np.zeros(0, np.float64)


class NativeBeam:
    """Native expansion kernel bound to one HmmStateNetwork; raises on
    library unavailability so callers can fall back."""

    def __init__(self, net):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native beam library unavailable")
        self._l = lib
        # keep the converted arrays alive for the handle's lifetime
        self._keep = [
            np.ascontiguousarray(net.loop_ok, np.uint8),
            np.ascontiguousarray(net.fwd_in, np.uint8),
            np.ascontiguousarray(net.skip_in, np.uint8),
            _f64(net.loop_pen), _f64(net.fwd_pen), _f64(net.skip_pen),
            _i64(net.emis), _i64(net.node_of),
            _i64(net.child_off), _i64(net.child_flat)]
        k = self._keep
        self._handle = lib.rasr_beam_net_create(
            len(net.emis),
            k[0].ctypes.data, k[1].ctypes.data, k[2].ctypes.data,
            _pf(k[3]), _pf(k[4]), _pf(k[5]), _pi(k[6]), _pi(k[7]),
            len(net.child_off) - 1, _pi(k[8]), _pi(k[9]))
        if not self._handle:
            raise RuntimeError("rasr_beam_net_create failed")
        self._obuf = None   # (beam_size-keyed) output buffers

    def __del__(self):
        if getattr(self, "_handle", None):
            self._l.rasr_beam_net_free(self._handle)
            self._handle = None

    def expand(self, beam: Tuple, exits: Optional[Tuple], inj: Tuple,
               frame: np.ndarray, la_row: Optional[np.ndarray],
               la_scale: float, hist_count: int, threshold: float,
               beam_size: int,
               lm_la: Optional[Tuple[np.ndarray, np.ndarray,
                                     np.ndarray]] = None):
        """beam/exits/inj: (state-or-node, hist, score, trace, bframe,
        bscore) array tuples (exits may be None).  lm_la: optional LM
        lookahead (pool (slots, n_la) f32, hist->slot i64 (hist_count,),
        state->la-node i64 (S,)) pruning bias.  Returns
        ((state, hist, score, trace, bframe, bscore), stats) with
        stats = (raw candidates, after recombination, within threshold);
        returns None when no candidates were generated (keep old beam,
        matching the numpy path)."""
        b = [(_i64 if i not in (2, 5) else _f64)(x)
             for i, x in enumerate(beam)]
        e = ([(_i64 if i not in (2, 5) else _f64)(x)
              for i, x in enumerate(exits)] if exits is not None
             else [_EMPTY_I, _EMPTY_I, _EMPTY_F,
                   _EMPTY_I, _EMPTY_I, _EMPTY_F])
        inj = [(_i64 if i not in (2, 5) else _f64)(x)
               for i, x in enumerate(inj)]
        frame = _f64(frame)
        la_arr = _f64(la_row) if la_row is not None else None
        if self._obuf is None or len(self._obuf[0]) < beam_size:
            self._obuf = (np.empty(beam_size, np.int64),
                          np.empty(beam_size, np.int64),
                          np.empty(beam_size, np.float64),
                          np.empty(beam_size, np.int64),
                          np.empty(beam_size, np.int64),
                          np.empty(beam_size, np.float64),
                          np.zeros(3, np.int64))
        (o_state, o_hist, o_score, o_trace, o_bframe, o_bscore,
         stats) = self._obuf
        la_p = _pf(la_arr) if la_arr is not None else None
        if lm_la is not None:
            pool, slot_map, state_map = lm_la
            pool = np.ascontiguousarray(pool, np.float32)
            slot_map = _i64(slot_map)
            state_map = _i64(state_map)
            lm_args = (pool.ctypes.data_as(_F32P), _pi(slot_map),
                       _pi(state_map), pool.shape[1])
            self._lm_keep = (pool, slot_map, state_map)
        else:
            lm_args = (None, None, None, 0)
        n_out = self._l.rasr_beam_expand(
            self._handle,
            len(b[0]), _pi(b[0]), _pi(b[1]), _pf(b[2]), _pi(b[3]),
            _pi(b[4]), _pf(b[5]),
            len(e[0]), _pi(e[0]), _pi(e[1]), _pf(e[2]), _pi(e[3]),
            _pi(e[4]), _pf(e[5]),
            len(inj[0]), _pi(inj[0]), _pi(inj[1]), _pf(inj[2]),
            _pi(inj[3]), _pi(inj[4]), _pf(inj[5]),
            _pf(frame), la_p, float(la_scale),
            *lm_args,
            int(hist_count), float(threshold), int(beam_size),
            _pi(o_state), _pi(o_hist), _pf(o_score), _pi(o_trace),
            _pi(o_bframe), _pf(o_bscore), _pi(stats))
        if n_out < 0:
            raise RuntimeError("rasr_beam_expand failed")
        if stats[0] == 0:
            return None
        n = int(n_out)
        # copies: the buffers are reused next frame
        return ((o_state[:n].copy(), o_hist[:n].copy(),
                 o_score[:n].copy(), o_trace[:n].copy(),
                 o_bframe[:n].copy(), o_bscore[:n].copy()),
                (int(stats[0]), int(stats[1]), int(stats[2])))
