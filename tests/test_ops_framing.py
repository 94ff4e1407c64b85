"""Unit tests for force_length / frames / get_frames — cross-checked against
torch.unfold semantics."""

import jax
import numpy as np
import torch

from wealy_tpu.ops import framing as F


class TestForceLength:
    def test_noop_when_exact(self, rng):
        x = rng.normal(size=(3, 10)).astype(np.float32)
        out = F.force_length(x, 10)
        np.testing.assert_array_equal(np.asarray(out), x)

    def test_repeat_pad(self):
        x = np.array([[1.0, 2.0, 3.0]], np.float32)
        out = np.asarray(F.force_length(x, 7, pad_mode="repeat"))
        np.testing.assert_allclose(out, [[1, 2, 3, 1, 2, 3, 1]])

    def test_zeros_pad(self):
        x = np.array([[1.0, 2.0, 3.0]], np.float32)
        out = np.asarray(F.force_length(x, 5, pad_mode="zeros"))
        np.testing.assert_allclose(out, [[1, 2, 3, 0, 0]])

    def test_cut_start_end(self):
        x = np.arange(10, dtype=np.float32)[None]
        np.testing.assert_allclose(np.asarray(F.force_length(x, 4, cut_mode="start")), [[0, 1, 2, 3]])
        np.testing.assert_allclose(np.asarray(F.force_length(x, 4, cut_mode="end")), [[6, 7, 8, 9]])

    def test_cut_random_window(self):
        x = np.arange(10, dtype=np.float32)[None]
        out = np.asarray(F.force_length(x, 4, cut_mode="random", key=jax.random.PRNGKey(0)))
        assert out.shape == (1, 4)
        # must be a contiguous window
        start = int(out[0, 0])
        np.testing.assert_allclose(out[0], np.arange(start, start + 4))

    def test_crazy_pad_shape_and_content(self):
        x = np.array([[1.0, 2.0]], np.float32)
        out = np.asarray(F.force_length(x, 8, pad_mode="crazy", key=jax.random.PRNGKey(1)))
        assert out.shape == (1, 8)
        # content is drawn from {0, 1, 2} only (blocks of x or zeros)
        assert set(np.unique(out)).issubset({0.0, 1.0, 2.0})

    def test_allow_longer(self):
        x = np.arange(10, dtype=np.float32)[None]
        out = F.force_length(x, 4, allow_longer=True)
        assert out.shape == (1, 10)

    def test_axis_arg(self, rng):
        x = rng.normal(size=(5, 3)).astype(np.float32)
        out = F.force_length(x, 8, axis=0, pad_mode="zeros")
        assert out.shape == (8, 3)
        np.testing.assert_allclose(np.asarray(out)[5:], 0.0)


class TestFrames:
    def test_matches_torch_unfold(self, rng):
        x = rng.normal(size=(2, 23)).astype(np.float32)
        got = np.asarray(F.frames(x, 5, 3))
        want = torch.tensor(x).unfold(-1, 5, 3).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_pad_end(self, rng):
        x = rng.normal(size=(25,)).astype(np.float32)
        got = np.asarray(F.frames(x, 10, 6, pad_end=True))
        # torch reference framing with same pad logic
        sig = torch.tensor(x)
        frames_overlap = 10 - 6
        rest = abs(25 - frames_overlap) % 6
        pad = 10 - rest
        sig = torch.nn.functional.pad(sig, (0, pad))
        want = sig.unfold(-1, 10, 6).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_middle_axis(self, rng):
        x = rng.normal(size=(2, 20, 3)).astype(np.float32)
        got = np.asarray(F.frames(x, 4, 4, axis=1))
        want = torch.tensor(x).unfold(1, 4, 4).numpy()
        assert got.shape == want.shape == (2, 5, 3, 4)
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestGetFrames:
    def test_pads_to_cover_tail(self, rng):
        x = rng.normal(size=(1, 25)).astype(np.float32)
        got = F.get_frames(x, 10, 6)
        # ceil((25-10)/6)*6 + 10 = 28 -> 4 frames
        assert got.shape == (1, 4, 10)
        # padded region is zeros
        np.testing.assert_allclose(np.asarray(got)[0, -1, 7:], 0.0)

    def test_no_pad(self, rng):
        x = rng.normal(size=(1, 30)).astype(np.float32)
        got = F.get_frames(x, 10, 10, pad_end=False)
        assert got.shape == (1, 3, 10)

    def test_jit(self, rng):
        x = rng.normal(size=(1, 25)).astype(np.float32)
        f = jax.jit(lambda a: F.get_frames(a, 10, 6))
        assert f(x).shape == (1, 4, 10)
