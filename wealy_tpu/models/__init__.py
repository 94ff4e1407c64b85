"""Model layer: JAX Whisper encoder/decoder for embedding extraction, the
WEALY projection heads, CNN/pooling building blocks, the CLEWS acoustic
encoder, and multimodal fusion models.

Reference surfaces: lib/layers.py (blocks), conf.model.name registry
(lib/embedding_dataset/collate_functions.py:428-430).
"""
