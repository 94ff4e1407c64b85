"""Tests for the background prefetch iterator."""

import time

import pytest

from wealy_tpu.utils.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(range(10), depth=3)) == list(range(10))


def test_transform_applied():
    assert list(prefetch([1, 2, 3], transform=lambda x: x * 2)) == [2, 4, 6]


def test_overlaps_producer_and_consumer():
    def slow_gen():
        for i in range(5):
            time.sleep(0.02)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_gen(), depth=4):
        time.sleep(0.02)  # consumer work overlaps producer work
    elapsed = time.perf_counter() - t0
    assert elapsed < 0.18, elapsed  # serial would be ~0.2s


def test_exception_propagates():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)
