"""rasr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech recognition framework.

A from-scratch rebuild of the capabilities of the RWTH ASR toolkit
(rwth-i6/rasr): Flow-style dataflow feature extraction compiled into fused
XLA programs, GMM/NN acoustic scoring as batched XLA computations,
HMM/CTC/transducer/AED decoders with host-side tree bookkeeping and
device-side batched scoring, plus corpus/lexicon/FSA/lattice processing and
acoustic model training.

Layer map (mirrors reference layering, SURVEY.md §1):
    core     — configuration, parameters, channels, archives, binary IO
    bliss    — corpus / lexicon / phoneme data model, evaluation
    fsa      — weighted finite-state automata (host)
    flow     — dataflow network model + compiler to fused JAX programs
    signal   — DSP ops (windowing, FFT, filterbank, DCT, CMVN, deltas)
    audio    — audio file reading (wav/raw)
    mm       — mixture models, feature scorers, estimators
    am       — acoustic model: allophones, state tying, HMM topology, TDP
    cart     — phonetic decision trees
    nn       — neural models (flax), label scorers, encoders
    lm       — language models (ARPA n-gram, neural)
    lattice  — word lattices
    flf      — lattice processing framework
    search   — decoders (beam searches, aligner)
    speech   — orchestration: corpus processing, recognizers, trainers
    tools    — CLI tools
    ops      — Pallas/XLA kernels for the hot paths
    parallel — device mesh, sharding, collectives
"""

__version__ = "0.1.0"
