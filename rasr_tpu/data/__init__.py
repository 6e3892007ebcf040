from .synth_speech import SynthSpeechTask

__all__ = ["SynthSpeechTask"]
