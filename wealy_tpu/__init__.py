"""WEALY-TPU: a TPU-native (JAX/XLA/Pallas/pjit) audio-based lyrics-matching framework.

A from-scratch rebuild of the capability set of
``helemanc/audio-based-lyrics-matching`` (WEALY — "Leveraging Whisper Embeddings
for Audio-based Lyrics Matching", arXiv:2510.08176), designed TPU-first:

- ``wealy_tpu.ops``      — masked reductions, pairwise distances, framing and
  distance-tensor reduction as pure jnp functions (reference: lib/tensor_ops.py).
- ``wealy_tpu.losses``   — NTXent / Triplet / CLEWS metric-learning losses with the
  uniform ``(z_label, z_idx, z, extra) -> (loss, logdict)`` contract
  (reference: lib/losses.py), fully vectorized (no Python loops) and
  mesh-aware (global-batch negatives via all_gather).
- ``wealy_tpu.audio``    — host audio decode + fused log-mel frontend (Pallas).
- ``wealy_tpu.models``   — JAX Whisper encoder/decoder for embedding extraction,
  projection heads and CNN blocks (reference: lib/layers.py).
- ``wealy_tpu.data``     — dataset metadata readers, filters, deterministic IDs,
  transcription validation/caching, chunking collates with static shapes
  (reference: lib/audio_dataset/, lib/embedding_dataset/).
- ``wealy_tpu.parallel`` — mesh/pjit helpers, sharded all-pairs similarity.
- ``wealy_tpu.eval``     — MAP/MR1 retrieval over chunked song embeddings.
- ``wealy_tpu.train``    — train step, optimizer, checkpointing, config.
"""

__version__ = "0.1.0"

# Convenience top-level exports (the subpackages stay the canonical API).
from wealy_tpu.train.config import Config  # noqa: E402,F401
