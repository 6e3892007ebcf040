"""Feature scorer factory.

The reference registers scorer variants by name (src/Mm/Module.cc:
diagonal-maximum, SIMD variants, batch-diagonal-maximum-{float,int,fast},
preselection-batch-*, ...).  On TPU all of them are realizations of the
same batched computation, so the factory maps every name onto the fused
scorers — the "fast"/"preselection" distinctions become kernel choices:

    diagonal-maximum / batch-* / preselection-* / simd-*  -> max approximation
    diagonal-sum                                          -> full log-sum
    pallas-*                                              -> fused Pallas kernel
"""

from __future__ import annotations

from typing import Optional

from ..core.configuration import Configuration
from .mixture_set import MixtureSet
from .scorer import GmmScorer

_MAX_NAMES = {
    "diagonal-maximum", "SIMD-diagonal-maximum", "fast-diagonal-maximum",
    "batch-diagonal-maximum-float", "batch-diagonal-maximum-int",
    "batch-diagonal-maximum-fast", "preselection-batch-float",
    "preselection-batch-int",
}
_SUM_NAMES = {"diagonal-sum", "full-sum"}


def create_feature_scorer(name: str, mixture_set: MixtureSet,
                          config: Optional[Configuration] = None,
                          use_pallas: Optional[bool] = None):
    """Scorer by reference name; use_pallas=None auto-selects the fused
    kernel on TPU backends for max-approximation scorers."""
    mixture_weight_scale = 1.0
    gaussian_scale = 1.0
    if config is not None:
        mixture_weight_scale = float(config.get("mixture-weight-scale") or 1.0)
        gaussian_scale = float(config.get("gaussian-scale") or 1.0)
    if name.startswith("pallas"):
        use_pallas = True
        name = name[len("pallas-"):] if name.startswith("pallas-") else \
            "diagonal-maximum"
    if name in _SUM_NAMES:
        return GmmScorer(mixture_set, mode="sum",
                         mixture_weight_scale=mixture_weight_scale,
                         gaussian_scale=gaussian_scale)
    if name not in _MAX_NAMES:
        raise ValueError(f"unknown feature scorer type {name!r}")
    if use_pallas is None:
        import jax
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        try:
            from ..ops.gmm_kernel import PallasGmmScorer
            return PallasGmmScorer(mixture_set,
                                   mixture_weight_scale=mixture_weight_scale,
                                   gaussian_scale=gaussian_scale)
        except Exception:
            pass
    return GmmScorer(mixture_set, mode="max",
                     mixture_weight_scale=mixture_weight_scale,
                     gaussian_scale=gaussian_scale)
