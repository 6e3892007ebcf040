"""Neural language models with batched device scoring.

The reference RecurrentLanguageModel (src/Lm/RecurrentLanguageModel.hh:89,
117-196) wraps a TF/ONNX RNN with per-history score caching, batch
assembly (min/opt/max batch sizes) and an async background forwarding
thread.  Here the model is a native flax LSTM and the same design becomes:
per-history score-row cache + one jitted batched forward per request wave;
histories pad to a static bucket so XLA re-uses compilations.

Scores follow the framework convention: -ln p(token | history).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .arpa import LanguageModel


class LstmLmModel(nn.Module):
    """Embedding -> unidirectional LSTM stack -> logits."""
    vocab_size: int
    embed_dim: int = 128
    hidden_dim: int = 256
    n_layers: int = 1

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens (B, L) int32 -> logits (B, L, V)."""
        x = nn.Embed(self.vocab_size, self.embed_dim, name="embed")(tokens)
        for i in range(self.n_layers):
            lstm = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim),
                          name=f"lstm{i}")
            x = lstm(x)
        return nn.Dense(self.vocab_size, name="output")(x)


def lstm_step_fns(model: LstmLmModel):
    """Single-step functional form of LstmLmModel for in-loop device
    fusion (per-hypothesis recurrent state threaded through a search
    loop — the reference's state-managed recurrent scorers,
    src/Nn/LstmStateManager.hh).

    Returns (init_carry(n), step(params, carry, tokens)):
      carry: per-layer (c, h) pairs, each (n, hidden_dim) float32;
      step consumes tokens (n,) int32 and returns (log_probs (n, V),
      new_carry), matching a full-sequence forward position-for-position.
    """
    def init_carry(n: int):
        return [(jnp.zeros((n, model.hidden_dim), jnp.float32),
                 jnp.zeros((n, model.hidden_dim), jnp.float32))
                for _ in range(model.n_layers)]

    def step(params, carry, tokens):
        x = params["embed"]["embedding"][tokens]
        new_carry = []
        for i in range(model.n_layers):
            cell = nn.OptimizedLSTMCell(model.hidden_dim)
            # the cell is constructed in LstmLmModel's scope, so its
            # params register as OptimizedLSTMCell_<i> (the RNN wrapper
            # itself owns none)
            (c, h), x = cell.apply(
                {"params": params[f"OptimizedLSTMCell_{i}"]},
                (carry[i][0], carry[i][1]), x)
            new_carry.append((c, h))
        logits = x @ params["output"]["kernel"] + params["output"]["bias"]
        return jax.nn.log_softmax(logits, -1), new_carry

    return init_carry, step


class NeuralLanguageModel(LanguageModel):
    """History-cached, batch-forwarded neural LM.

    Histories are token-id tuples starting with BOS.  score_batch collects
    all uncached histories, pads them to a shared length bucket and runs ONE
    device forward — the synchronous analogue of the reference's
    double-buffered request queue (the async variant belongs to the search
    driver, which can call `prefetch` ahead of time).
    """

    def __init__(self, model: LstmLmModel, params,
                 vocab: Sequence[str], bos: str = "<s>", eos: str = "</s>",
                 unk: str = "<unk>", max_batch: int = 64,
                 state_compression: Optional[str] = None,
                 backend: Optional[str] = None):
        """state_compression: None stores raw float32 score rows per
        history; "int8" quantizes each cached row to int8 with a per-row
        affine scale (4x memory reduction for wide-beam/long-segment
        searches — the reference's nn-output-compression,
        src/Nn/CompressedVector.hh:52, src/Lm/RecurrentLanguageModel.hh:
        292-293)."""
        self.model = model
        self.params = params
        self.vocab = list(vocab)
        self._ids = {t: i for i, t in enumerate(self.vocab)}
        self.bos_id = self._ids.get(bos, 0)
        self.eos = eos
        self.unk_id = self._ids.get(unk, 0)
        self.max_batch = max_batch
        self._max_batch_configured = max_batch
        from ..nn.compressed import StateCodec
        self._codec = StateCodec(state_compression)   # validates mode
        self.state_compression = state_compression
        self._cache: Dict[Tuple[int, ...], object] = {}
        # backend="cpu" keeps the (small) LM forward off the accelerator:
        # in-search scoring issues many tiny per-wave forwards whose
        # device-call latency would dominate (the reference solves the
        # same problem with its async batching thread,
        # src/Lm/RecurrentLanguageModel.hh:183-196)
        self._fwd = jax.jit(self._forward, backend=backend)

    @classmethod
    def load(cls, file: str, info: str, **kwargs) -> "NeuralLanguageModel":
        """Construct from a checkpoint pair: `file` = msgpack params,
        `info` = JSON {"model": LstmLmModel kwargs, "vocab": [tokens]}
        (the registration contract the reference keeps in
        src/Lm/Module.cc:66-73 for its tfrnn/onnx recurrent LMs)."""
        import json

        from ..nn.checkpoint import load_params
        with open(info) as fh:
            meta = json.load(fh)
        model = LstmLmModel(**meta["model"])
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 2), jnp.int32))["params"]
        params, _ = load_params(file, template)
        return cls(model, params, meta["vocab"], **kwargs)

    # -- cached-row codec -----------------------------------------------------

    def _encode_row(self, row: np.ndarray):
        return self._codec.encode(row)

    def _decode_row(self, packed) -> np.ndarray:
        return self._codec.decode(packed)

    def cache_bytes(self) -> int:
        """Resident byte size of the history-row cache (for the
        state-compression artifact)."""
        return sum(self._codec.nbytes(v) for v in self._cache.values())

    def _forward(self, tokens):
        logits = self.model.apply({"params": self.params}, tokens)
        return jax.nn.log_softmax(logits, axis=-1)

    # -- history api ---------------------------------------------------------

    def initial_history(self) -> Tuple[int, ...]:
        return (self.bos_id,)

    def token_id(self, token: str) -> int:
        return self._ids.get(token, self.unk_id)

    def extended_history(self, history, token) -> Tuple[int, ...]:
        tid = token if isinstance(token, int) else self.token_id(token)
        return tuple(history) + (tid,)

    # -- scoring ------------------------------------------------------------------

    def _row(self, history: Tuple[int, ...]) -> np.ndarray:
        row = self._cache.get(history)
        if row is None:
            self.prefetch([history])
            row = self._cache[history]
        return self._decode_row(row)

    def prefetch(self, histories: Sequence[Tuple[int, ...]]) -> None:
        """Forward all uncached histories in one padded device batch.

        Histories pad on the RIGHT (the causal LSTM never sees the pad
        before each row's read position) and each row's score is read at
        its own last-token position; batch and length pad to buckets so
        XLA re-uses a handful of compilations."""
        todo = [tuple(h) for h in histories if tuple(h) not in self._cache]
        if not todo:
            return
        todo = list(dict.fromkeys(todo))
        for chunk_start in range(0, len(todo), self.max_batch):
            chunk = todo[chunk_start:chunk_start + self.max_batch]
            # the empty history (context-free/unigram table requests)
            # scores as a single BOS prime
            seqs = [h if len(h) else (self.bos_id,) for h in chunk]
            max_len = -(-max(len(s) for s in seqs) // 16) * 16
            b = -(-len(chunk) // 8) * 8
            batch = np.full((b, max_len), self.bos_id, dtype=np.int32)
            for i, s in enumerate(seqs):
                batch[i, :len(s)] = s
            lp = np.asarray(self._fwd(jnp.asarray(batch)))
            for i, (h, s) in enumerate(zip(chunk, seqs)):
                self._cache[h] = self._encode_row(lp[i, len(s) - 1])

    def score(self, history, token) -> float:
        tid = token if isinstance(token, int) else self.token_id(token)
        return float(-self._row(tuple(history))[tid])

    def score_dense(self, history) -> np.ndarray:
        """-ln p(w | history) for the whole vocabulary — the dense row
        contract the tree search's batched word-end scoring and LM
        lookahead consume (same convention as ArpaLm.score_dense), which
        is what makes the neural LM a drop-in FIRST-PASS LM
        (src/Lm/RecurrentLanguageModel.hh:89: usable anywhere a
        LanguageModel goes)."""
        return -self._row(tuple(history))

    def sentence_end_score(self, history) -> float:
        return self.score(history, self.eos)

    def score_batch(self, histories, tokens) -> np.ndarray:
        self.prefetch([tuple(h) for h in histories])
        tids = [t if isinstance(t, int) else self.token_id(t) for t in tokens]
        out = np.empty((len(histories), len(tids)), dtype=np.float32)
        for i, h in enumerate(histories):
            row = self._row(tuple(h))
            out[i] = -row[tids]
        return out

    def set_search_space_info(self, info: Dict) -> None:
        """Search-space-aware scheduling (reference
        src/Lm/SearchSpaceAwareLanguageModel.hh:38): size the prefetch
        wave to the live history count so one device forward covers a
        frame's requests without padding waste."""
        self.search_space_info = dict(info)
        n = int(info.get("active_histories", 0))
        if n > 0:
            # size the prefetch wave to the LARGEST live-history count
            # seen so far (grow-only: shrinking would churn padded batch
            # shapes), bounded by the configured cap
            want = max(16, 1 << (n - 1).bit_length())
            self._hook_hwm = max(getattr(self, "_hook_hwm", 16), want)
            self.max_batch = min(self._max_batch_configured,
                                 self._hook_hwm)

    def cleanup_cache(self, keep: Optional[Sequence[Tuple[int, ...]]] = None
                      ) -> None:
        """History pruning (reference history_pruning / cache-cleanup)."""
        if keep is None:
            self._cache.clear()
        else:
            keep_set = {tuple(h) for h in keep}
            self._cache = {h: r for h, r in self._cache.items()
                           if h in keep_set}
