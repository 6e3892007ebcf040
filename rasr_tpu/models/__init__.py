"""Neural model zoo (flax): conformer CTC (flagship, with causal streaming
mode), attention encoder-decoder, transducer — the model families the
reference runs via TF/ONNX sessions, implemented natively."""

from .aed import AedModel
from .conformer import ConformerCtc, ConformerEncoder
from .hybrid import HybridConformerAm
from .presets import CONFORMER_PRESETS, aed, conformer_ctc, transducer
from .transducer import TransducerModel, rnnt_loss, transducer_greedy

__all__ = ["AedModel", "ConformerCtc", "ConformerEncoder",
           "HybridConformerAm",
           "TransducerModel", "rnnt_loss", "transducer_greedy",
           "CONFORMER_PRESETS", "aed", "conformer_ctc", "transducer"]
