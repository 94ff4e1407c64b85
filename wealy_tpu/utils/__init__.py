"""Shared utilities: mask-convention converters, logging/metrics helpers."""

from wealy_tpu.utils.masks import valid_to_excluded, excluded_to_valid

__all__ = ["valid_to_excluded", "excluded_to_valid"]
