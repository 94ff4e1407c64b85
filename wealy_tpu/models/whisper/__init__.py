"""JAX/Flax Whisper (tiny..large-v3-turbo) for TPU embedding extraction.

The reference consumes precomputed Whisper embeddings produced out-of-repo
(SURVEY.md §0, §3.5; file taxonomy at lib/embedding_dataset/base_dataset.py:99-126).
This package owns that stage: mel (wealy_tpu.audio) -> encoder (1500, d) ->
optional greedy decode -> decoder last-hidden-state embeddings, in bf16 with
f32 accumulation.
"""

from wealy_tpu.models.whisper.config import WhisperConfig, WHISPER_CONFIGS
from wealy_tpu.models.whisper.model import WhisperEncoder, WhisperDecoder, Whisper
from wealy_tpu.models.whisper.convert import (
    params_from_hf_state_dict,
    params_from_openai_state_dict,
)
from wealy_tpu.models.whisper.generate import greedy_decode
from wealy_tpu.models.whisper.beam import beam_decode

__all__ = [
    "beam_decode",
    "WhisperConfig",
    "WHISPER_CONFIGS",
    "WhisperEncoder",
    "WhisperDecoder",
    "Whisper",
    "params_from_hf_state_dict",
    "params_from_openai_state_dict",
    "greedy_decode",
]
