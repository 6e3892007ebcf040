"""int8-quantized conformer inference (w8a8 projections on the MXU).

Post-training symmetric quantization of every wide projection in the
flagship ConformerCtc — FFN wi/wo, attention q/k/v/out, conv pointwise
GLU halves and pointwise2, and the CTC head — as int8 x int8 -> int32
MXU matmuls (2x the bf16 GEMM rate on TPU v5e), with

  * weights   per-output-channel scales, quantized once at load time,
  * activations dynamic per-row (token) scales quantized in-graph, OR
    static per-site scales calibrated offline (calibrate_activation_
    scales + freeze): the static path removes the per-token abs-max
    reduction from every projection — quantize becomes one fused
    scale+round+clip epilogue,

so y = (x_q @ w_q) * s_x * s_w + b.  Everything that carries the
numerics (layer norms, softmax, residuals, depthwise conv, subsampling)
stays bf16/f32 — the same split the reference uses in its int16/int8
SIMD mixture scorers, where only the big dot products are integer and
normalization stays float (/root/reference/src/Mm/SimdFeatureScorer.hh:44,
src/Mm/BatchFeatureScorer.hh:34 `batch-diagonal-maximum-int`).

Usage:
    qparams = quantize_params(params, model.n_layers)   # once, host-side
    logits, out_lens = quantized_ctc_forward(model, qparams, feats, lens)
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from .conformer import ConformerCtc, ConvSubsampling, _pos_mask, _sinusoidal
from .pipelined import unbox
from .tp_conformer import _layer_norm, split_pointwise1

_EPS = 1e-8

#: "xla" = quantize / GEMM / rescale as separate XLA ops; "pallas" = the
#: fused quantize-into-GEMM kernel (ops/int8_gemm_kernel.py) — one HBM
#: read of x, one of w_q, one write of y per projection.
MATMUL_IMPL = os.environ.get("RASR_INT8_IMPL", "xla")

#: when set (a dict), eager int8_matmul calls record per-site max |x|
#: into it instead of being used for real inference — the calibration
#: mode behind calibrate_activation_scales()
_CALIBRATION = None


# ---------------------------------------------------------------------------
# quantized primitive
# ---------------------------------------------------------------------------

def quantize_weight(w: jnp.ndarray, name: str = "") -> dict:
    """Symmetric per-output-channel int8: w (D, N) -> int8 + (N,) scales.
    `name` keys the site for static activation-scale calibration."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), _EPS) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": s, "name": name}


def int8_matmul(x: jnp.ndarray, wq: dict, bias=None,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x (..., D) float -> (..., N): activation quantization (static
    per-site scale when calibrated, else dynamic per-row) + int8 MXU
    GEMM + float rescale."""
    x = x.astype(jnp.float32)
    if _CALIBRATION is not None and wq.get("name"):
        m = float(jnp.max(jnp.abs(x)))
        k = wq["name"]
        _CALIBRATION[k] = max(_CALIBRATION.get(k, 0.0), m)
    act = wq.get("act_scale")
    if MATMUL_IMPL == "pallas" and _CALIBRATION is None:
        from ..ops.int8_gemm_kernel import int8_quant_matmul, supported_shape
        K, N = wq["q"].shape
        M = x.size // K
        if supported_shape(K, N, M):
            return int8_quant_matmul(
                x, wq["q"], wq["scale"], bias=bias,
                act_scale=(None if act is None else jnp.float32(act)),
                out_dtype=out_dtype)
    if act is not None:
        # static scale: no per-token reduction, one fused epilogue
        s_x = jnp.float32(act)
        xq = jnp.clip(jnp.round(x * (1.0 / s_x)),
                      -127, 127).astype(jnp.int8)
    else:
        s_x = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                          _EPS) / 127.0
        xq = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq["q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * wq["scale"]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# parameter preparation
# ---------------------------------------------------------------------------

def _quantize_block(blk: Any, prefix: str = "") -> Any:
    """One ConformerBlock subtree -> quantized-projection subtree (layer
    norms / biases / depthwise conv kept float)."""
    blk = split_pointwise1(unbox(blk))
    out = {"ff1": {}, "ff2": {}, "mhsa": {}, "conv": {},
           "final_ln": blk["final_ln"]}
    for ff in ("ff1", "ff2"):
        out[ff] = {"ln": blk[ff]["ln"],
                   "wi": {"w": quantize_weight(blk[ff]["wi"]["kernel"],
                                               f"{prefix}/{ff}/wi"),
                          "b": blk[ff]["wi"]["bias"]},
                   "wo": {"w": quantize_weight(blk[ff]["wo"]["kernel"],
                                               f"{prefix}/{ff}/wo"),
                          "b": blk[ff]["wo"]["bias"]}}
    a = blk["mhsa"]["attn"]
    D = a["query"]["kernel"].shape[0]
    H, Dh = a["query"]["kernel"].shape[1:]
    mh = {"ln": blk["mhsa"]["ln"]}
    for name in ("query", "key", "value"):
        mh[name] = {"w": quantize_weight(
            a[name]["kernel"].reshape(D, H * Dh),
            f"{prefix}/mhsa/{name}"),
            "b": a[name]["bias"].reshape(H * Dh)}
    mh["out"] = {"w": quantize_weight(
        a["out"]["kernel"].reshape(H * Dh, D), f"{prefix}/mhsa/out"),
        "b": a["out"]["bias"]}
    out["mhsa"] = mh
    c = blk["conv"]
    out["conv"] = {"ln": c["ln"], "norm": c["norm"],
                   "depthwise": c["depthwise"],
                   "pw1a": {"w": quantize_weight(c["pw1a"]["kernel"],
                                                 f"{prefix}/conv/pw1a"),
                            "b": c["pw1a"]["bias"]},
                   "pw1b": {"w": quantize_weight(c["pw1b"]["kernel"],
                                                 f"{prefix}/conv/pw1b"),
                            "b": c["pw1b"]["bias"]},
                   "pointwise2": {"w": quantize_weight(
                       c["pointwise2"]["kernel"],
                       f"{prefix}/conv/pointwise2"),
                       "b": c["pointwise2"]["bias"]}}
    return out


def quantize_params(params: Any, n_layers: int,
                    act_scales: Any = None,
                    keep_names: bool = False) -> Any:
    """Full ConformerCtc param tree -> quantized inference tree
    (subsampling kept float; blocks + CTC head quantized).  act_scales:
    optional {site name: max |x|} from calibrate_activation_scales —
    when given, every projection gets a static activation scale.
    Site-name strings are stripped afterwards (a jit argument tree may
    not contain strings); keep_names=True retains them for eager
    calibration runs."""
    params = unbox(params)
    enc = params["encoder"]
    qp = {"subsample": enc["subsample"],
          "blocks": [_quantize_block(enc[f"block{i}"], f"block{i}")
                     for i in range(n_layers)],
          "ctc_head": {"w": quantize_weight(params["ctc_head"]["kernel"],
                                            "ctc_head"),
                       "b": params["ctc_head"]["bias"]}}
    if act_scales:
        _apply_act_scales(qp, act_scales)
    if not keep_names:
        def strip(node):
            if isinstance(node, dict):
                node.pop("name", None)
                for v in node.values():
                    strip(v)
            elif isinstance(node, list):
                for v in node:
                    strip(v)
        strip(qp)
    return qp


def _apply_act_scales(qp: Any, act_scales: dict) -> None:
    """Attach act_scale = calibrated max / 127 to every named site."""
    def walk(node):
        if isinstance(node, dict):
            if "q" in node and "name" in node:
                m = act_scales.get(node["name"])
                if m is not None:
                    node["act_scale"] = max(float(m), _EPS) / 127.0
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
    walk(qp)


def calibrate_activation_scales(model: ConformerCtc, qparams: Any,
                                features, lengths) -> dict:
    """Run ONE eager (non-jit) quantized forward recording per-site
    max |x| at every int8 projection input; returns {site: max}.
    Static scales trade the per-token abs-max reduction for a fixed
    clipping range — the bench's WER gate verifies the trade."""
    global _CALIBRATION
    import numpy as _np
    _CALIBRATION = {}
    try:
        quantized_ctc_forward(model, qparams,
                              jnp.asarray(_np.asarray(features)),
                              jnp.asarray(_np.asarray(lengths)))
        return dict(_CALIBRATION)
    finally:
        _CALIBRATION = None


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _q_feed_forward(p, x, dtype):
    h = _layer_norm(x, p["ln"]["scale"], p["ln"]["bias"]).astype(dtype)
    h = jax.nn.swish(int8_matmul(h, p["wi"]["w"], p["wi"]["b"], dtype))
    return int8_matmul(h, p["wo"]["w"], p["wo"]["b"], dtype)


def _q_mhsa(p, x, mask, dtype, causal, n_heads,
            attention_impl="xla"):
    h = _layer_norm(x, p["ln"]["scale"], p["ln"]["bias"]).astype(dtype)
    B, T, D = h.shape
    H, Dh = n_heads, D // n_heads
    q = int8_matmul(h, p["query"]["w"], p["query"]["b"],
                    dtype).reshape(B, T, H, Dh)
    k = int8_matmul(h, p["key"]["w"], p["key"]["b"],
                    dtype).reshape(B, T, H, Dh)
    v = int8_matmul(h, p["value"]["w"], p["value"]["b"],
                    dtype).reshape(B, T, H, Dh)
    if attention_impl == "pallas" and not causal:
        from ..ops.attention_kernel import make_flax_attention_fn
        attn_mask = mask[:, None, None, :]
        ctx = make_flax_attention_fn()(q, k, v, mask=attn_mask)
    else:
        q = q / jnp.sqrt(jnp.asarray(Dh, dtype))
        logits = jnp.einsum("bqhk,bthk->bhqt", q, k).astype(jnp.float32)
        attn_mask = mask[:, None, None, :]
        if causal:
            attn_mask = attn_mask & jnp.tril(
                jnp.ones((T, T), bool))[None, None]
        logits = jnp.where(attn_mask, logits, jnp.finfo(jnp.float32).min)
        w = jax.nn.softmax(logits, axis=-1).astype(dtype)
        ctx = jnp.einsum("bhqt,bthk->bqhk", w, v)
    return int8_matmul(ctx.reshape(B, T, H * Dh), p["out"]["w"],
                       p["out"]["b"], dtype)


def _q_conv(p, x, mask, dtype, causal):
    h = _layer_norm(x, p["ln"]["scale"], p["ln"]["bias"]).astype(dtype)
    h = h * mask[..., None].astype(dtype)
    ha = int8_matmul(h, p["pw1a"]["w"], p["pw1a"]["b"], dtype)
    hb = int8_matmul(h, p["pw1b"]["w"], p["pw1b"]["b"], dtype)
    h = ha * jax.nn.sigmoid(hb)
    kern = p["depthwise"]["kernel"].astype(dtype)
    K = kern.shape[0]
    pad = ((K - 1, 0),) if causal else ((K // 2, (K - 1) // 2),)
    h = jax.lax.conv_general_dilated(
        h, kern, window_strides=(1,), padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=h.shape[-1])
    h = h + p["depthwise"]["bias"].astype(dtype)
    h = _layer_norm(h, p["norm"]["scale"], p["norm"]["bias"]).astype(dtype)
    h = jax.nn.swish(h)
    return int8_matmul(h, p["pointwise2"]["w"], p["pointwise2"]["b"], dtype)


def _q_block(p, x, mask, dtype, causal, n_heads, attention_impl):
    x = x + 0.5 * _q_feed_forward(p["ff1"], x, dtype)
    x = x + _q_mhsa(p["mhsa"], x, mask, dtype, causal, n_heads,
                    attention_impl)
    x = x + _q_conv(p["conv"], x, mask, dtype, causal)
    x = x + 0.5 * _q_feed_forward(p["ff2"], x, dtype)
    return _layer_norm(x, p["final_ln"]["scale"],
                       p["final_ln"]["bias"]).astype(dtype)


def quantized_ctc_forward(model: ConformerCtc, qparams: Any,
                          features: jnp.ndarray, lengths: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 inference forward: (logits, output lengths)."""
    dtype = model.dtype
    sub = ConvSubsampling(model.d_model, dtype, model.causal)
    h, out_lengths = sub.apply({"params": qparams["subsample"]},
                               features, lengths)
    T2 = h.shape[1]
    mask = _pos_mask(out_lengths, T2)
    h = h + jnp.asarray(_sinusoidal(T2, model.d_model), dtype=h.dtype)[None]
    for p in qparams["blocks"]:
        h = _q_block(p, h, mask, dtype, model.causal, model.n_heads,
                     model.attention_impl)
    logits = int8_matmul(h, qparams["ctc_head"]["w"],
                         qparams["ctc_head"]["b"], jnp.float32)
    return logits, out_lengths
