"""Config-driven label-scorer construction.

The reference builds LabelScorers from config through Nn::Module's
registered types (src/Nn/Module.cc:132-218); this factory is the single
place config keys become scorer objects — used by the librasr API
(rasr_tpu.api.SearchAlgorithm) and by the speech-recognizer tool, so
both construct identical models from the same .config file.

Supported [label-scorer] types:
  no-op          inputs are the scores (externally computed posteriors);
                 needs n-labels
  prior          prior-subtracting wrapper: priors-file + scale (+ child)
  encoder-only   flax ConformerCtc from [model] checkpoint
  combine        sum of scaled children: [label-scorer.sub-0], ...
plus any user type added via register_label_scorer_type.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.configuration import Configuration
from .label_scorer import (CombineLabelScorer, EncoderOnlyLabelScorer,
                           NoOpLabelScorer, PriorLabelScorer,
                           ScaledLabelScorer, _SCORER_TYPES)


def _encoder_only_from_config(config: Configuration) -> EncoderOnlyLabelScorer:
    """ConformerCtc encoder from [model]: checkpoint, vocab-size, d-model,
    n-layers, n-heads, feature-dim."""
    import jax
    import jax.numpy as jnp

    from ..models import ConformerCtc
    from .checkpoint import load_params
    model_cfg = config.sub("model")
    ckpt = model_cfg.get("checkpoint")
    vocab = int(model_cfg.get("vocab-size") or 0)
    if not (ckpt and vocab):
        raise ValueError("model.checkpoint and model.vocab-size required "
                         "for encoder-only")
    model = ConformerCtc(
        vocab_size=vocab,
        d_model=int(model_cfg.get("d-model") or 256),
        n_layers=int(model_cfg.get("n-layers") or 12),
        n_heads=int(model_cfg.get("n-heads") or 4),
        # checkpoints trained with an InterCTC auxiliary head carry its
        # params; the restore template must match
        intermediate_ctc_layer=int(
            model_cfg.get("intermediate-ctc-layer") or 0),
        attention_impl=model_cfg.get("attention-impl") or "xla")
    dummy_d = int(model_cfg.get("feature-dim") or 80)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, dummy_d)),
                          jnp.asarray([8]),
                          mutable=["params", "intermediates"])["params"]
    params, _ = load_params(ckpt, template)
    # stored f16 exports cast back to f32 at load
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if np.asarray(x).dtype == np.float16 else x, params)

    # params as a jit ARGUMENT (device-resident), not a closure: embedded
    # flagship-size literals are rejected by the remote-compile tunnel
    params = jax.device_put(params)

    @jax.jit
    def fwd(p, feats, lens):
        logits, out_lens, _ = model.apply(
            {"params": p}, feats, lens, deterministic=True)
        return jax.nn.log_softmax(logits, -1), out_lens

    def encode(x):
        lp, n = fwd(params, jnp.asarray(x)[None],
                    jnp.asarray([x.shape[0]], jnp.int32))
        return np.asarray(lp[0, :int(n[0])])

    return EncoderOnlyLabelScorer(encode, n_labels=vocab)


class AedPrefixScorer:
    """Autoregressive score_fn for the label-synchronous searches, built
    entirely from [model] config (reference: encoder-decoder label
    scorers constructed by Nn::Module from config,
    src/Nn/Module.cc:132-218).

    Contract (search/lexiconfree_labelsync.py): __call__(histories
    (B, L) int32 with BOS) -> (B, V) negative log-probs of the next
    label.  The searches call set_features(features) from
    put_features(), which runs the encoder once per segment.

    STATIC SHAPES: jit retraces per argument shape, so naive use (feature
    length per utterance, prefix length per step, beam width per step)
    compiles hundreds of programs.  Instead features pad to a multiple of
    `feat_bucket` frames, histories always pad to `max_labels + 1`, and
    the beam rows pad to the next power of two — the true prefix length
    rides in as a traced scalar and indexes the logits dynamically, so a
    whole decode reuses a handful of compiled programs (and the padded
    future positions cannot leak into position L-1 through the causal
    decoder mask)."""

    def __init__(self, model, params, max_labels: int = 200,
                 feat_bucket: int = 128):
        import jax
        import jax.numpy as jnp
        self.model = model
        # params stay jit ARGUMENTS (device-resident): closing them over
        # would embed them as XLA literals, which the remote-compile
        # tunnel rejects for flagship-size checkpoints (HTTP 413)
        self.params = jax.device_put(params)
        self.n_labels = model.vocab_size
        self.max_labels = int(max_labels)
        self.feat_bucket = int(feat_bucket)
        self._enc = None
        self._enc_mask = None

        self._encode = jax.jit(
            lambda p, f, l: model.apply({"params": p}, f, l,
                                        method=model.encode))

        @jax.jit
        def prefix_scores(p, enc, enc_mask, histories, last):
            logits = model.apply({"params": p}, enc, enc_mask,
                                 histories, method=model.decode)
            return -jax.nn.log_softmax(
                logits[:, last].astype(jnp.float32), -1)

        self._scores = prefix_scores
        self._jnp = jnp

    def set_features(self, features: np.ndarray) -> None:
        jnp = self._jnp
        x = np.asarray(features, np.float32)
        t = x.shape[0]
        bt = self.feat_bucket
        t_pad = max(bt, ((t + bt - 1) // bt) * bt)
        if t_pad != t:
            x = np.pad(x, ((0, t_pad - t), (0, 0)))
        lens = jnp.asarray([t], "int32")
        self._enc, self._enc_mask = self._encode(
            self.params, jnp.asarray(x)[None], lens)

    def __call__(self, histories: np.ndarray) -> np.ndarray:
        if self._enc is None:
            raise RuntimeError("AedPrefixScorer: set_features not called "
                               "(searches call it from put_features)")
        jnp = self._jnp
        histories = np.asarray(histories, np.int32)
        n, length = histories.shape
        n_pad = 1 << (n - 1).bit_length()
        l_pad = self.max_labels + 1
        if length > l_pad:          # longer than the hint: next 16-bucket
            l_pad = ((length + 15) // 16) * 16
        buf = np.zeros((n_pad, l_pad), np.int32)
        buf[:n, :length] = histories
        enc = jnp.repeat(self._enc, n_pad, axis=0)
        mask = jnp.repeat(self._enc_mask, n_pad, axis=0)
        out = self._scores(self.params, enc, mask, jnp.asarray(buf),
                           jnp.asarray(length - 1, jnp.int32))
        return np.asarray(out[:n])


def aed_prefix_scorer_from_config(config: Configuration
                                  ) -> "AedPrefixScorer":
    """AedModel + checkpoint from [model]: type=aed, checkpoint,
    vocab-size, d-model, encoder-layers, decoder-layers, n-heads,
    feature-dim."""
    model, params = _aed_model_from_config(config)
    max_labels = int(config.sub("search-algorithm").get("max-labels")
                     or 200)
    return AedPrefixScorer(model, params, max_labels=max_labels)


def _aed_model_from_config(config: Configuration):
    """(AedModel, params) from [model] (shared by the prefix scorer and
    the cached decoder)."""
    import jax
    import jax.numpy as jnp

    from ..models.aed import AedModel
    from .checkpoint import load_params
    mc = config.sub("model")
    ckpt = mc.get("checkpoint")
    vocab = int(mc.get("vocab-size") or 0)
    if not (ckpt and vocab):
        raise ValueError("model.checkpoint and model.vocab-size required "
                         "for the AED decoder")
    # size the positional table to cover the configured label budget
    # (max-labels > the default 512 would otherwise clamp the gather
    # and repeat the last embedding, ADVICE r3).  An EXPLICIT
    # model.max-positions is honored verbatim so the downstream
    # max-labels >= table validation can fire on a genuinely
    # mis-sized model instead of being silently out-grown.
    want = int(config.sub("search-algorithm").get("max-labels") or 0)
    explicit_pos = mc.get("max-positions")
    max_pos = (int(explicit_pos) if explicit_pos
               else max(512, want + 1))
    model = AedModel(
        vocab_size=vocab,
        d_model=int(mc.get("d-model") or 256),
        encoder_layers=int(mc.get("encoder-layers")
                           or mc.get("n-layers") or 12),
        decoder_layers=int(mc.get("decoder-layers") or 4),
        n_heads=int(mc.get("n-heads") or 4),
        max_positions=max_pos,
        dtype=jnp.float32 if (mc.get("dtype") or "") == "float32"
        else jnp.bfloat16)
    dim = int(mc.get("feature-dim") or 80)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, dim)), jnp.asarray([8]),
                          jnp.zeros((1, 4), jnp.int32))["params"]
    params, _ = load_params(ckpt, template)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if np.asarray(x).dtype == np.float16 else x, params)
    return model, params


def aed_decoder_from_config(config: Configuration,
                            beam_size: Optional[int] = None):
    """CachedAedDecoder (device label-sync beam) from [model] + beam
    options from [search-algorithm] — the encoder-decoder path the
    reference builds from config (src/Nn/Module.cc:132-218).

    `beam_size`, when given (the search factory passes its
    _pruning-derived value), wins over the raw config read so the
    device and host paths honor max-beam-size identically."""
    from ..search.aed_cached import CachedAedDecoder
    model, params = _aed_model_from_config(config)
    sa = config.sub("search-algorithm")
    if beam_size is None:
        beam_size = int(sa.get("max-beam-size") or sa.get("beam-size") or 8)
    max_labels = int(sa.get("max-labels") or 200)
    if max_labels >= model.max_positions:
        raise ValueError(
            f"search-algorithm.max-labels={max_labels} exceeds the AED "
            f"decoder's positional table ({model.max_positions}); set "
            f"model.max-positions accordingly")
    # optional unit-LM shallow fusion inside the device beam
    # (search-algorithm.lm-checkpoint/lm-info/lm-scale)
    lm_model = lm_params = None
    lm_scale = float(sa.get("lm-scale") or 0.0)
    if lm_scale and sa.get("lm-checkpoint"):
        import json as _json

        import jax
        import jax.numpy as jnp

        from ..lm.neural import LstmLmModel
        from .checkpoint import load_params as _load
        if not sa.get("lm-info"):
            raise ValueError(
                "search-algorithm.lm-checkpoint needs lm-info "
                "(JSON with the LM model kwargs)")
        with open(sa.get("lm-info")) as fh:
            lm_meta = _json.load(fh)
        lm_model = LstmLmModel(**lm_meta["model"])
        template = lm_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 2), jnp.int32))["params"]
        lm_params, _ = _load(sa.get("lm-checkpoint"), template)
    return CachedAedDecoder(
        model, params,
        beam_size=beam_size,
        max_labels=max_labels,
        eos=int(sa.get("sentence-end-index") or 0),
        length_norm_scale=float(sa.get("length-norm-scale") or 1.0),
        device_beam=(sa.get("device-beam") or "true").lower()
        not in ("false", "no", "0"),
        lm_model=lm_model, lm_params=lm_params, lm_scale=lm_scale)


def transducer_decoder_from_config(config: Configuration):
    """CachedTransducerDecoder from [model]: type=transducer, checkpoint,
    vocab-size, d-model, encoder-layers, pred-hidden, joint-dim, n-heads;
    beam options from [search-algorithm].  The stateful-scorer path the
    reference builds from config (src/Nn/Module.cc:132-218 +
    src/Nn/LabelScorer/StatefulOnnxLabelScorer.hh:92)."""
    import jax
    import jax.numpy as jnp

    from ..models.transducer import TransducerModel
    from ..search.transducer_cached import CachedTransducerDecoder
    from .checkpoint import load_params
    mc = config.sub("model")
    ckpt = mc.get("checkpoint")
    vocab = int(mc.get("vocab-size") or 0)
    if not (ckpt and vocab):
        raise ValueError("model.checkpoint and model.vocab-size required "
                         "for the transducer decoder")
    model = TransducerModel(
        vocab_size=vocab,
        d_model=int(mc.get("d-model") or 256),
        encoder_layers=int(mc.get("encoder-layers")
                           or mc.get("n-layers") or 12),
        pred_hidden=int(mc.get("pred-hidden") or 320),
        joint_dim=int(mc.get("joint-dim") or 320),
        n_heads=int(mc.get("n-heads") or 4),
        dtype=jnp.float32 if (mc.get("dtype") or "") == "float32"
        else jnp.bfloat16)
    dim = int(mc.get("feature-dim") or 80)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, dim)), jnp.asarray([8]),
                          jnp.zeros((1, 4), jnp.int32))["params"]
    params, _ = load_params(ckpt, template)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if np.asarray(x).dtype == np.float16 else x, params)
    sa = config.sub("search-algorithm")
    return CachedTransducerDecoder(
        model, params,
        blank=int(sa.get("blank-label-index") or 0),
        beam_size=int(sa.get("max-beam-size") or sa.get("beam-size") or 8),
        max_symbols_per_frame=int(sa.get("max-symbols-per-frame") or 3),
        expansion_topk=int(sa.get("expansion-topk") or 4),
        # label budget of the device beam: emissions past this are
        # score-killed on device, so long segments need it raised
        # (host path has no cap; documented in the decoder docstring)
        max_labels=int(sa.get("max-labels") or 128),
        state_compression=sa.get("state-compression") or None,
        device_beam=(sa.get("device-beam") or "true").lower()
        not in ("false", "no", "0"))


def label_scorer_from_config(config: Configuration,
                             selector: str = "label-scorer"):
    """Build the configured scorer; `config` is the tool/root config (the
    [model] section for checkpoints lives next to [label-scorer])."""
    ls = config.sub(selector)
    typ = ls.get("type") or "no-op"
    if typ == "no-op":
        n = int(ls.get("n-labels") or 0)
        if not n:
            raise ValueError(f"{selector}.n-labels required for no-op")
        return NoOpLabelScorer(n)
    if typ == "encoder-only":
        return _encoder_only_from_config(config)
    if typ == "prior":
        child = label_scorer_from_config(config, selector + ".child") \
            if ls.sub("child").get("type") else None
        pf = ls.get("priors-file") or ls.get("file")
        priors = np.loadtxt(pf, dtype=np.float32) if pf else None
        scale = float(ls.get("scale") or 1.0)
        scorer = PriorLabelScorer(priors, scale=scale)
        if child is not None:
            return CombineLabelScorer([child, scorer])
        return scorer
    if typ == "combine":
        children = []
        i = 0
        while ls.sub(f"sub-{i}").get("type"):
            child = label_scorer_from_config(config, f"{selector}.sub-{i}")
            scale = float(ls.sub(f"sub-{i}").get("scale") or 1.0)
            children.append(ScaledLabelScorer(child, scale)
                            if scale != 1.0 else child)
            i += 1
        if not children:
            raise ValueError(f"combine {selector} has no sub-0 scorer")
        return CombineLabelScorer(children)
    # user-registered types: factory(config) when it accepts a config
    factory = _SCORER_TYPES.get(typ)
    if factory is None:
        raise ValueError(f"unknown label-scorer type {typ!r}; known: "
                         f"{sorted(_SCORER_TYPES)}")
    try:
        return factory(config)
    except TypeError:
        raise ValueError(
            f"label-scorer type {typ!r} cannot be built from config; "
            f"construct it programmatically and pass it in") from None
