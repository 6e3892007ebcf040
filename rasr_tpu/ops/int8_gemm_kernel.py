"""Pallas TPU kernel: fused quantize-into-GEMM for w8a8 inference.

The XLA int8 path (models/quantized.py `int8_matmul`) runs three HBM
passes per projection: (1) quantize the activations f32 -> int8, (2) the
int8 MXU GEMM, (3) rescale int32 -> float (+bias).  At flagship shapes
(M = B*T' ~ 51k rows, K/N = 512..2048) passes 1 and 3 are pure
HBM-bandwidth overhead that eats the int8 MXU gain — the measured
reason the int8 bench trailed bf16 (ROADMAP "Performance").

This kernel fuses all three: each (TM, TN) grid step loads one bf16/f32
activation tile into VMEM, quantizes it on the VPU (static calibrated
scale, or per-row dynamic abs-max — both stay on-chip), runs the
int8 x int8 -> int32 MXU GEMM against the resident weight tile, and
applies the float rescale + bias epilogue before the single output
write.  HBM traffic per projection drops to one read of x, one read of
w_q, one write of y — the same traffic as the bf16 GEMM but at the
int8 MXU rate (2x bf16 peak on v5e).

Functionally this replaces the runtime-generated integer SIMD scorers
of the reference (/root/reference/src/Mm/SimdFeatureScorer.hh:44,
src/Mm/BatchFeatureScorer.hh:34): integer dot products, float
normalization — generated for the exact shapes at hand.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_static(sx_ref, x_ref, w_ref, sw_ref, b_ref, out_ref):
    """Static activation scale from SMEM: quantize tile -> MXU -> rescale."""
    s_x = sx_ref[0, 0]
    inv = 1.0 / s_x
    x = x_ref[:].astype(jnp.float32)
    xq = jnp.clip(jnp.round(x * inv), -127.0, 127.0).astype(jnp.int8)
    acc = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sw_ref[:] * s_x) + b_ref[:]
    out_ref[:] = y.astype(out_ref.dtype)


def _kernel_dynamic(x_ref, w_ref, sw_ref, b_ref, out_ref):
    """Per-row dynamic scale, computed on-chip (K is fully resident)."""
    x = x_ref[:].astype(jnp.float32)
    s_row = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                        1e-8) * (1.0 / 127.0)          # (TM, 1)
    xq = jnp.clip(jnp.round(x / s_row), -127.0, 127.0).astype(jnp.int8)
    acc = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_row * sw_ref[:]) + b_ref[:]
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "tm", "tn",
                                             "interpret"))
def _int8_gemm(x, wq, sw, bias, sx, out_dtype=jnp.bfloat16,
               tm: int = 256, tn: int = 512, interpret: bool = False):
    """x (M, K) float; wq (K, N) int8; sw (N,) f32; bias (N,) f32;
    sx: () f32 static activation scale, or None for per-row dynamic.
    Returns (M, N) out_dtype."""
    M, K = x.shape
    N = wq.shape[1]
    tm = min(tm, M)
    tn = min(tn, N)
    grid = (pl.cdiv(M, tm), pl.cdiv(N, tn))
    sw2 = sw.reshape(1, N).astype(jnp.float32)
    b2 = bias.reshape(1, N).astype(jnp.float32)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * x.dtype.itemsize + K * N + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )
    data_specs = [
        pl.BlockSpec((tm, K), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, tn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    if sx is None:
        return pl.pallas_call(
            _kernel_dynamic, in_specs=data_specs, **common,
        )(x, wq, sw2, b2)
    sx2 = jnp.asarray(sx, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        _kernel_static,
        in_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)] + data_specs,
        **common,
    )(sx2, x, wq, sw2, b2)


def int8_quant_matmul(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
                      bias: Optional[jnp.ndarray] = None,
                      act_scale: Optional[jnp.ndarray] = None,
                      out_dtype=jnp.bfloat16,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused y = dequant(quant(x) @ wq) + bias over arbitrary leading dims.

    x (..., K) float; wq (K, N) int8; sw (N,) per-output-channel weight
    scales; act_scale: static activation scale (None -> per-row dynamic,
    computed on-chip).  Lanes want K and N as multiples of 128 — the
    flagship's projections all are; callers with odd shapes should use
    the XLA path.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = wq.shape[1]
    x2 = x.reshape(-1, K)
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    y = _int8_gemm(x2, wq, sw, bias, act_scale, out_dtype=out_dtype,
                   interpret=interpret)
    return y.reshape(*lead, N)


def supported_shape(K: int, N: int, M: int) -> bool:
    """Kernel constraint check (lane alignment + a worthwhile M)."""
    return K % 128 == 0 and N % 128 == 0 and M % 8 == 0 and M >= 8
