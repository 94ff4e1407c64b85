"""Data layer: dataset metadata, filters, deterministic IDs, transcription
validation/caching, clique sampling, static-shape chunking collates, and the
embedding store.

Reference surfaces: lib/audio_dataset/ (raw-audio + transcription stack) and
lib/embedding_dataset/ (precomputed-embedding stack). This layer is a
re-design, not a port: metadata handling is vectorized pandas (no iterrows),
caches are JSON/NPZ (no pickle), and every collate emits **fixed-shape**
arrays so jitted steps never recompile (SURVEY.md §7 "hard parts").
"""

from wealy_tpu.data.metadata import (
    Metadata,
    load_metadata,
    load_shs,
    load_lyric_covers,
    load_discogs_vi,
)
from wealy_tpu.data.ids import (
    deterministic_song_id,
    assign_deterministic_ids,
    global_clique_id_mapping,
)
from wealy_tpu.data.filters import (
    remove_versions_without_audio,
    remove_single_version_cliques,
    remove_overlapping_cliques,
)
from wealy_tpu.data.transcription import TranscriptionValidator, TranscriptionCache

__all__ = [
    "Metadata",
    "load_metadata",
    "load_shs",
    "load_lyric_covers",
    "load_discogs_vi",
    "deterministic_song_id",
    "assign_deterministic_ids",
    "global_clique_id_mapping",
    "remove_versions_without_audio",
    "remove_single_version_cliques",
    "remove_overlapping_cliques",
    "TranscriptionValidator",
    "TranscriptionCache",
]
