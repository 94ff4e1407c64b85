"""Audio frontend: decode (host), resample (TPU), fused log-mel (Pallas/XLA).

The reference externalizes this entirely (it calls ``whisper.load_audio`` at
lib/audio_dataset/dataset.py:652-654 and consumes precomputed embeddings);
here it is the flagship TPU workload: waveform -> 30 s chunks -> log-mel ->
Whisper encoder, all on device.
"""

from wealy_tpu.audio.mel import (
    SAMPLE_RATE,
    N_FFT,
    HOP_LENGTH,
    CHUNK_LENGTH,
    N_SAMPLES,
    N_FRAMES,
    hann_window,
    mel_filterbank,
    log_mel_spectrogram,
    pad_or_trim,
)
from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
from wealy_tpu.audio.resample import resample
from wealy_tpu.audio.decode import load_audio

__all__ = [
    "SAMPLE_RATE",
    "N_FFT",
    "HOP_LENGTH",
    "CHUNK_LENGTH",
    "N_SAMPLES",
    "N_FRAMES",
    "hann_window",
    "mel_filterbank",
    "log_mel_spectrogram",
    "log_mel_spectrogram_pallas",
    "pad_or_trim",
    "resample",
    "load_audio",
]
