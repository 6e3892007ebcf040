"""Neural model zoo (flax): conformer CTC (flagship), and the model
families the reference runs via TF/ONNX bridges — implemented natively."""

from .conformer import ConformerCtc, ConformerEncoder

__all__ = ["ConformerCtc", "ConformerEncoder"]
