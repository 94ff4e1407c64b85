"""Evaluation layer: MAP / MR1 / P@k retrieval metrics over chunked song
embeddings (the implied ``evaluate()`` of the reference, SURVEY.md §3.4)."""

from wealy_tpu.eval.retrieval import (
    average_precision,
    rank_metrics,
    regroup_chunks,
    song_distance_matrix,
    evaluate_retrieval,
)

__all__ = [
    "average_precision",
    "rank_metrics",
    "regroup_chunks",
    "song_distance_matrix",
    "evaluate_retrieval",
]
