"""Tests for MAP/MR1 metrics, chunk regrouping, and song-level scoring."""

import numpy as np
import pytest

from wealy_tpu.eval import (
    average_precision,
    evaluate_retrieval,
    rank_metrics,
    regroup_chunks,
    song_distance_matrix,
)


class TestAveragePrecision:
    def test_perfect(self):
        assert average_precision([1, 1, 0, 0]) == 1.0

    def test_known_value(self):
        # relevant at ranks 1 and 3: AP = (1/1 + 2/3) / 2
        np.testing.assert_allclose(average_precision([1, 0, 1, 0]), (1 + 2 / 3) / 2)

    def test_no_relevant(self):
        assert average_precision([0, 0, 0]) == 0.0


class TestRankMetrics:
    def test_hand_computed(self):
        # 3 songs, labels [0, 0, 1]; distances put the positive first for q0
        dist = np.array(
            [
                [0.0, 0.1, 0.9],  # q0: self, pos at d=.1, neg at .9
                [0.1, 0.0, 0.5],  # q1: pos at .1 (rank1)
                [0.9, 0.5, 0.0],  # q2: no other song with label 1 -> skipped
            ]
        )
        labels = np.array([0, 0, 1])
        m = rank_metrics(dist, labels, labels)
        assert m["n_queries"] == 2
        np.testing.assert_allclose(m["MAP"], 1.0)
        np.testing.assert_allclose(m["MR1"], 1.0)

    def test_rank_two(self):
        dist = np.array(
            [
                [0.0, 0.9, 0.1],  # q0: neg closer than pos -> pos at rank 2
                [0.9, 0.0, 0.5],
                [0.1, 0.5, 0.0],
            ]
        )
        labels = np.array([0, 0, 1])
        m = rank_metrics(dist, labels, labels)
        # q0: ranking [cand2(d=.1, label1), cand1(d=.9, label0)] -> AP=1/2, MR1=2
        # q1: ranking [cand2(.5), cand0(.9)] -> pos (cand0) at rank 2 -> AP=1/2
        np.testing.assert_allclose(m["MAP"], 0.5)
        np.testing.assert_allclose(m["MR1"], 2.0)

    def test_self_excluded_by_version_idx(self):
        dist = np.zeros((2, 2))
        labels = np.array([0, 0])
        ids = np.array([10, 11])
        m = rank_metrics(dist, labels, labels, query_idx=ids, cand_idx=ids)
        assert m["n_queries"] == 2  # each query ranks only the other


class TestRegroup:
    def test_basic(self, rng):
        embs = rng.normal(size=(5, 4)).astype(np.float32)
        info = np.array(
            [[0, 0, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0], [1, 0, 1]]
        )
        sets, mask, b, v = regroup_chunks(embs, info)
        assert sets.shape == (3, 2, 4)
        np.testing.assert_array_equal(mask.sum(axis=1), [2, 1, 2])
        np.testing.assert_array_equal(b, [0, 0, 1])
        np.testing.assert_array_equal(v, [0, 1, 0])
        np.testing.assert_allclose(sets[0, 0], embs[0])
        np.testing.assert_allclose(sets[1, 0], embs[2])

    def test_chunk_valid_filter(self, rng):
        embs = rng.normal(size=(4, 4)).astype(np.float32)
        info = np.array([[0, 0, 0], [0, 0, 1], [-1, -1, -1], [-1, -1, -1]])
        valid = np.array([True, True, False, False])
        sets, mask, b, v = regroup_chunks(embs, info, valid)
        assert sets.shape == (1, 2, 4)


class TestSongDistances:
    def test_identical_songs_zero_cos(self, rng):
        a = rng.normal(size=(1, 3, 8)).astype(np.float32)
        mask = np.ones((1, 3), bool)
        d = song_distance_matrix(a, mask, a, mask, mode="cos", redux="min")
        np.testing.assert_allclose(d[0, 0], 0.0, atol=1e-5)

    def test_padding_chunks_excluded(self, rng):
        # song A padded with a garbage chunk; mask must exclude it
        core = rng.normal(size=(2, 8)).astype(np.float32)
        a = np.concatenate([core, np.full((1, 8), 1e3, np.float32)])[None]
        mask_a = np.array([[True, True, False]])
        b = core[None]
        mask_b = np.ones((1, 2), bool)
        d_min = song_distance_matrix(a, mask_a, b, mask_b, mode="sqeuc", redux="min")
        np.testing.assert_allclose(d_min[0, 0], 0.0, atol=1e-4)
        d_max = song_distance_matrix(a, mask_a, b, mask_b, mode="sqeuc", redux="max")
        # max over valid pairs only: garbage chunk (distance ~1e6) excluded
        assert d_max[0, 0] < 1e4

    def test_end_to_end_retrieval(self, rng):
        # two cliques of two songs; same-clique songs share chunk structure
        base1 = rng.normal(size=(3, 16)).astype(np.float32)
        base2 = rng.normal(size=(3, 16)).astype(np.float32)
        songs = np.stack(
            [
                base1,
                base1 + 0.01 * rng.normal(size=(3, 16)).astype(np.float32),
                base2,
                base2 + 0.01 * rng.normal(size=(3, 16)).astype(np.float32),
            ]
        )
        mask = np.ones((4, 3), bool)
        labels = np.array([0, 0, 1, 1])
        m = evaluate_retrieval(songs, mask, labels, redux="smean")
        np.testing.assert_allclose(m["MAP"], 1.0)
        np.testing.assert_allclose(m["MR1"], 1.0)
        assert m["_dist"].shape == (4, 4)
