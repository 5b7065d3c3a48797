"""wav2vec2forbrain_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
brain-to-text decoding with Wav2Vec2 knowledge transfer.

Re-implements, TPU-first, the capabilities of the reference PyTorch codebase
(yuanhao-chen-nyoeghau/Wav2Vec2ForBrain): neural-signal preprocessing, an
FC+GRU brain feature extractor feeding a Wav2Vec2 / Wav2Vec2-Conformer (RoPE)
encoder, CTC training with partial-unfreeze + warmup schedules, greedy and
LM-beam-search decoding, experiment lifecycle, sweeps, and results persistence.

Nothing here is a port: on-device compute is one jitted, shardable function
(preprocessing -> scan-GRU -> transformer encoder -> CTC), host code handles
data, decode and orchestration.
"""

__version__ = "0.1.0"
