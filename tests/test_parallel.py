"""Multi-device tests on the 8-device virtual CPU mesh: sharded similarity
equals the single-device result; global-batch losses equal single-device
losses; gradients flow through the all_gather (SURVEY.md §4, test tier 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wealy_tpu.losses import clews_loss, ntxent_loss
from wealy_tpu.ops.distance import pairwise_distance_matrix
from wealy_tpu.parallel import (
    global_batch_loss,
    make_mesh,
    sharded_pairwise_distance,
    sharded_topk,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh()


class TestShardedSimilarity:
    def test_matches_single_device(self, mesh, rng):
        x = rng.normal(size=(37, 16)).astype(np.float32)  # deliberately ragged
        y = rng.normal(size=(53, 16)).astype(np.float32)
        got = np.asarray(sharded_pairwise_distance(x, y, mesh, mode="cossim"))
        want = np.asarray(pairwise_distance_matrix(x, y, mode="cossim"))
        assert got.shape == (37, 53)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_blocked_matches(self, mesh, rng):
        x = rng.normal(size=(16, 8)).astype(np.float32)
        y = rng.normal(size=(45, 8)).astype(np.float32)
        got = np.asarray(
            sharded_pairwise_distance(x, y, mesh, mode="cos", block_size=16)
        )
        want = np.asarray(pairwise_distance_matrix(x, y, mode="cos"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_topk(self, mesh, rng):
        x = rng.normal(size=(10, 8)).astype(np.float32)
        y = rng.normal(size=(30, 8)).astype(np.float32)
        vals, idx = sharded_topk(x, y, mesh, k=5, mode="cossim")
        full = np.asarray(pairwise_distance_matrix(x, y, mode="cossim"))
        want_idx = np.argsort(-full, axis=1)[:, :5]
        # compare scores (indices may tie-swap)
        want_vals = np.take_along_axis(full, want_idx, axis=1)
        np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-5, atol=1e-6)

    def test_topk_distance_mode(self, mesh, rng):
        x = rng.normal(size=(6, 8)).astype(np.float32)
        y = rng.normal(size=(20, 8)).astype(np.float32)
        vals, idx = sharded_topk(x, y, mesh, k=3, mode="euc")
        full = np.asarray(pairwise_distance_matrix(x, y, mode="euc"))
        want = np.sort(full, axis=1)[:, :3]
        np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("mode", ["cossim", "euc"])
    def test_topk_blocked_matches_unblocked(self, mesh, rng, mode):
        """Column-blocked sharded_topk (round-2 VERDICT weak #5): streaming
        candidate blocks with a running top-k merge must reproduce the
        unblocked result bit for bit — values AND indices, including at a
        non-dividing block size (padded corpus rows never win)."""
        x = rng.normal(size=(21, 8)).astype(np.float32)
        y = rng.normal(size=(77, 8)).astype(np.float32)
        wv, wi = sharded_topk(x, y, mesh, k=7, mode=mode)
        gv, gi = sharded_topk(x, y, mesh, k=7, mode=mode, block_size=16)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=1e-6, atol=1e-7
        )

    def test_topk_blocked_tie_order(self, mesh):
        """Duplicated scores: blocked merge must keep lax.top_k's
        earliest-column-wins tie order across block boundaries."""
        # 4 identical candidate rows scattered across blocks + noise rows
        rng = np.random.default_rng(7)
        x = rng.normal(size=(8, 4)).astype(np.float32)
        base = rng.normal(size=(40, 4)).astype(np.float32)
        dup = base[3].copy()
        for pos in (3, 11, 19, 35):  # one per 10-wide block
            base[pos] = dup
        wv, wi = sharded_topk(x, base, mesh, k=6, mode="dotsim")
        gv, gi = sharded_topk(x, base, mesh, k=6, mode="dotsim", block_size=10)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))

    @pytest.mark.slow
    def test_topk_blocked_8k_x_64k(self, mesh):
        """VERDICT round-2 item 7 'done' criterion at (8K x 64K) scale:
        the running top-k merge is block-size invariant with bounded
        per-chip transients ((Q/d, block) instead of (Q/d, 64K)).

        Compares two BLOCKED runs (4096 vs 8192) rather than blocked vs
        unblocked: the unblocked reference at this scale materialized
        per-shard (Q/d, 64K) similarities + XLA:CPU top_k sort temporaries
        across all 8 virtual devices — an ~18 GB transient that was THE
        pytest-process peak poisoning every later subprocess ru_maxrss
        probe (see test_scale_eval._run_bounded: ru_maxrss is inherited
        through fork+exec on this kernel). Exact blocked == unblocked
        equality is asserted by the two tests above on every mode and on
        cross-block tie order."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(8192, 8)).astype(np.float32)
        y = rng.normal(size=(65536, 8)).astype(np.float32)
        wv, wi = sharded_topk(x, y, mesh, k=10, mode="cossim", block_size=8192)
        gv, gi = sharded_topk(x, y, mesh, k=10, mode="cossim", block_size=4096)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=1e-6, atol=1e-7
        )


class TestGlobalBatchLoss:
    def _batch(self, rng, B=16):
        labels = np.repeat(np.arange(B // 2, dtype=np.int32), 2)
        idx = np.arange(B, dtype=np.int32)
        z = rng.normal(size=(B, 8)).astype(np.float32)
        return labels, idx, z

    def test_clews_matches_single_device(self, mesh, rng):
        labels, idx, z = self._batch(rng)
        gl = global_batch_loss(clews_loss, mesh)
        loss_g, ld_g = jax.jit(gl)(labels, idx, z)
        loss_s, ld_s = clews_loss(labels, idx, z)
        np.testing.assert_allclose(float(loss_g), float(loss_s), rtol=1e-5)
        np.testing.assert_allclose(
            float(ld_g["l_cont"]), float(ld_s["l_cont"]), rtol=1e-5
        )

    def test_ntxent_matches_single_device(self, mesh, rng):
        labels, idx, z = self._batch(rng)
        gl = global_batch_loss(ntxent_loss, mesh)
        loss_g, _ = jax.jit(gl)(labels, idx, z)
        loss_s, _ = ntxent_loss(labels, idx, z)
        np.testing.assert_allclose(float(loss_g), float(loss_s), rtol=1e-5)

    def test_gradients_match(self, mesh, rng):
        labels, idx, z = self._batch(rng)
        gl = global_batch_loss(clews_loss, mesh)
        # jit the grads: un-jitted shard_map runs in eager impl mode, which
        # dispatches every primitive per-device (~10 s on the 1-core CI box)
        g_global = jax.jit(jax.grad(lambda z: gl(labels, idx, z)[0]))(jnp.asarray(z))
        g_single = jax.jit(jax.grad(lambda z: clews_loss(labels, idx, z)[0]))(
            jnp.asarray(z)
        )
        np.testing.assert_allclose(
            np.asarray(g_global), np.asarray(g_single), rtol=1e-4, atol=1e-6
        )

    def test_sharded_inputs(self, mesh, rng):
        # explicitly shard the batch over the mesh and verify the wrapped loss
        # still returns the global value
        from wealy_tpu.parallel.mesh import data_sharding

        labels, idx, z = self._batch(rng)
        zl = jax.device_put(jnp.asarray(labels), data_sharding(mesh, 1))
        zi = jax.device_put(jnp.asarray(idx), data_sharding(mesh, 1))
        zz = jax.device_put(jnp.asarray(z), data_sharding(mesh, 2))
        gl = global_batch_loss(clews_loss, mesh)
        loss_g, _ = jax.jit(gl)(zl, zi, zz)
        loss_s, _ = clews_loss(labels, idx, z)
        np.testing.assert_allclose(float(loss_g), float(loss_s), rtol=1e-5)


class TestStreamingChunkSetRanks:
    @pytest.mark.parametrize("redux", ["smean", "bpwr"])
    def test_matches_monolithic_redux(self, rng, redux):
        """3-D chunk-set inputs: streaming block scoring with
        distance_tensor_redux must reproduce the monolithic
        song_distance_matrix + rank_metrics result exactly (the reference
        test protocol at corpus scale)."""
        from wealy_tpu.eval.retrieval import rank_metrics, song_distance_matrix
        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        S, smax, C = 30, 5, 12
        labels = np.repeat(np.arange(10), 3)
        base = rng.normal(size=(10, C)).astype(np.float32)
        sets = np.zeros((S, smax, C), np.float32)
        mask = np.zeros((S, smax), bool)
        for i in range(S):
            n = int(rng.integers(1, smax + 1))
            sets[i, :n] = base[labels[i]][None] + 0.6 * rng.normal(size=(n, C))
            mask[i, :n] = True
        ids = np.arange(S)

        d = song_distance_matrix(sets, mask, sets, mask, mode="cos", redux=redux)
        want = rank_metrics(d, labels, labels, query_idx=ids, cand_idx=ids, topk=(10,))

        ranks, n_rel = streaming_relevant_ranks(
            sets, sets, labels, labels,
            mode="cos", redux=redux, block_size=7, query_block=11,
            query_idx=ids, corpus_idx=ids,
            query_mask=mask, corpus_mask=mask,
        )
        got = map_from_ranks(ranks, n_rel, topk=(10,))
        assert abs(got["MAP"] - want["MAP"]) < 1e-9, (got["MAP"], want["MAP"])
        assert abs(got["MR1"] - want["MR1"]) < 1e-9

    def test_mesh_chunk_sets(self, mesh, rng):
        """Chunk-set streaming over the 8-device mesh matches no-mesh."""
        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        S, smax, C = 19, 3, 8
        labels = np.arange(S) // 2
        base = rng.normal(size=(S // 2 + 1, C)).astype(np.float32)
        sets = base[labels][:, None, :] + 0.5 * rng.normal(
            size=(S, smax, C)
        ).astype(np.float32)
        mask = np.ones((S, smax), bool)
        mask[3, 1:] = False
        args = dict(
            mode="cos", redux="smean", block_size=4, query_block=4,
            query_mask=mask, corpus_mask=mask,
        )
        r1, n1 = streaming_relevant_ranks(sets, sets, labels, labels, **args)
        r2, n2 = streaming_relevant_ranks(
            sets, sets, labels, labels, mesh=mesh, **args
        )
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(n1, n2)


class TestStreamingRanks:
    def test_matches_rank_metrics(self, rng):
        from wealy_tpu.eval.retrieval import rank_metrics
        from wealy_tpu.ops.distance import pairwise_distance_matrix
        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        Q, C = 40, 16
        labels = np.repeat(np.arange(10), 4)  # 10 cliques x 4 versions
        z = rng.normal(size=(Q, C)).astype(np.float32)
        # make same-clique embeddings correlated so metrics are non-trivial
        for c in range(10):
            z[labels == c] += 2.0 * rng.normal(size=(C,)).astype(np.float32)

        full = np.asarray(pairwise_distance_matrix(z, z, mode="cos"))
        want = rank_metrics(full, labels, labels)

        ranks, n_rel = streaming_relevant_ranks(
            z, z, labels, labels, mode="cos", block_size=7
        )
        got = map_from_ranks(ranks, n_rel)
        assert got["n_queries"] == want["n_queries"]
        np.testing.assert_allclose(got["MR1"], want["MR1"], rtol=1e-6)
        np.testing.assert_allclose(got["MAP"], want["MAP"], rtol=1e-6)

    def test_similarity_mode(self, rng):
        from wealy_tpu.eval.retrieval import rank_metrics
        from wealy_tpu.ops.distance import pairwise_distance_matrix
        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        labels = np.repeat(np.arange(5), 3)
        z = rng.normal(size=(15, 8)).astype(np.float32)
        sim = np.asarray(pairwise_distance_matrix(z, z, mode="cossim"))
        want = rank_metrics(1.0 - sim, labels, labels)
        ranks, n_rel = streaming_relevant_ranks(
            z, z, labels, labels, mode="cossim", block_size=4
        )
        got = map_from_ranks(ranks, n_rel)
        np.testing.assert_allclose(got["MAP"], want["MAP"], rtol=1e-6)

    def test_scale_smoke_2000_songs(self, rng):
        """Corpus-scale smoke: 2000 songs through the streaming path with a
        small block size — shapes/ranks stay consistent at scale."""
        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        N = 2000
        labels = np.repeat(np.arange(N // 4), 4)
        z = rng.normal(size=(N, 32)).astype(np.float32)
        for c in range(N // 4):
            z[labels == c] += 3.0 * rng.normal(size=(32,)).astype(np.float32)
        ranks, n_rel = streaming_relevant_ranks(
            z, z, labels, labels, mode="cossim", block_size=256, max_relevant=3
        )
        m = map_from_ranks(ranks, n_rel)
        assert m["n_queries"] == N
        assert m["MAP"] > 0.9  # strongly clustered fixture
        assert (n_rel == 3).all()


class TestStreamingTieSemantics:
    """VERDICT round 1 weak #5: tie handling must exactly match rank_metrics'
    stable ascending sort — verified on fixtures WITH duplicated scores."""

    def _dup_fixture(self, rng):
        # 12 cliques x 4; several corpus rows are exact duplicates, including
        # duplicates ACROSS cliques (equal-score irrelevant candidates).
        labels = np.repeat(np.arange(12), 4)
        z = rng.normal(size=(48, 8)).astype(np.float32)
        z[5] = z[2]     # clique 1 dup of clique 0 row (irrelevant tie)
        z[9] = z[8]     # within-clique duplicate (relevant-relevant tie)
        z[30] = z[2]    # three-way duplicate across cliques
        z[44] = z[45]   # within-clique duplicate
        return labels, z

    @pytest.mark.parametrize("mode", ["cos", "cossim", "sqeuc"])
    def test_duplicated_scores_match_rank_metrics(self, rng, mode):
        from wealy_tpu.eval.retrieval import rank_metrics
        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        labels, z = self._dup_fixture(rng)
        full = np.asarray(pairwise_distance_matrix(z, z, mode=mode))
        # rank_metrics ranks by ascending distance; flip similarity modes
        want = rank_metrics(-full if mode.endswith("sim") else full, labels, labels)
        ranks, n_rel = streaming_relevant_ranks(
            z, z, labels, labels, mode=mode, block_size=7
        )
        got = map_from_ranks(ranks, n_rel, topk=(10,))
        assert got["n_queries"] == want["n_queries"]
        np.testing.assert_allclose(got["MAP"], want["MAP"], rtol=1e-9)
        np.testing.assert_allclose(got["MR1"], want["MR1"], rtol=1e-9)
        np.testing.assert_allclose(got["P@10"], want["P@10"], rtol=1e-9)

    def test_identical_embeddings_whole_clique(self, rng):
        """Pathological all-tie case: every member of a clique identical."""
        from wealy_tpu.eval.retrieval import rank_metrics
        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        labels = np.repeat(np.arange(4), 5)
        z = rng.normal(size=(20, 8)).astype(np.float32)
        z[labels == 2] = z[10]  # clique 2: 5 identical rows
        full = np.asarray(pairwise_distance_matrix(z, z, mode="cos"))
        want = rank_metrics(full, labels, labels)
        ranks, n_rel = streaming_relevant_ranks(
            z, z, labels, labels, mode="cos", block_size=6
        )
        got = map_from_ranks(ranks, n_rel)
        np.testing.assert_allclose(got["MAP"], want["MAP"], rtol=1e-9)
        np.testing.assert_allclose(got["MR1"], want["MR1"], rtol=1e-9)


class TestStreamingNoTruncation:
    def test_default_covers_largest_clique(self, rng):
        """max_relevant=None (default) must not truncate a 100-version clique
        (VERDICT round 1: the silent 64 cap corrupted MAP on large cliques)."""
        from wealy_tpu.eval.retrieval import rank_metrics
        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        labels = np.concatenate([np.zeros(100, np.int64), np.repeat(np.arange(1, 6), 3)])
        z = rng.normal(size=(115, 8)).astype(np.float32)
        z[labels == 0] += 2.0 * rng.normal(size=(8,)).astype(np.float32)
        ranks, n_rel = streaming_relevant_ranks(
            z, z, labels, labels, mode="cos", block_size=32
        )
        assert ranks.shape[1] == 99  # largest relevant set, not a fixed cap
        assert n_rel[labels == 0].max() == 99
        full = np.asarray(pairwise_distance_matrix(z, z, mode="cos"))
        want = rank_metrics(full, labels, labels)
        got = map_from_ranks(ranks, n_rel)
        np.testing.assert_allclose(got["MAP"], want["MAP"], rtol=1e-9)

    def test_explicit_cap_logs_warning(self, rng, caplog):
        import logging

        from wealy_tpu.parallel.similarity import streaming_relevant_ranks

        labels = np.repeat(np.arange(3), 6)
        z = rng.normal(size=(18, 4)).astype(np.float32)
        with caplog.at_level(logging.WARNING, logger="wealy_tpu.parallel.similarity"):
            ranks, n_rel = streaming_relevant_ranks(
                z, z, labels, labels, mode="cos", max_relevant=2
            )
        assert any("truncates" in r.message for r in caplog.records)
        assert ranks.shape[1] == 2 and (n_rel == 2).all()


class TestStreamingMesh:
    def test_mesh_matches_host(self, mesh, rng):
        """SURVEY §2.8 item 4: the streamed rank pass sharded over the mesh
        equals the single-device result (ragged Q, ragged blocks)."""
        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        labels = np.repeat(np.arange(13), 3)
        z = rng.normal(size=(39, 16)).astype(np.float32)
        r0, n0 = streaming_relevant_ranks(z, z, labels, labels, mode="cossim", block_size=10)
        r1, n1 = streaming_relevant_ranks(
            z, z, labels, labels, mesh=mesh, mode="cossim", block_size=10,
            query_block=16,
        )
        np.testing.assert_array_equal(n0, n1)
        np.testing.assert_array_equal(r0, r1)
        m0, m1 = map_from_ranks(r0, n0), map_from_ranks(r1, n1)
        assert m0 == m1


@pytest.mark.slow
class TestResidentRanks:
    """Device-resident fast path of streaming_relevant_ranks (resident=
    'auto'): must be BIT-equal to the streamed path — same padded blocks,
    same per-block math, only the dispatch structure differs."""

    def test_vectors_bit_equal(self, rng):
        from wealy_tpu.parallel.similarity import streaming_relevant_ranks

        N, C = 57, 8
        labels = np.arange(N) // 3
        z = rng.normal(size=(N, C)).astype(np.float32)
        # duplicated rows across block boundaries: tie ranks must agree
        z[19] = z[3]
        z[41] = z[3]
        args = dict(mode="cossim", block_size=10, query_block=13)
        r_res, n_res = streaming_relevant_ranks(
            z, z, labels, labels, resident=True, **args
        )
        r_str, n_str = streaming_relevant_ranks(
            z, z, labels, labels, resident=False, **args
        )
        np.testing.assert_array_equal(r_res, r_str)
        np.testing.assert_array_equal(n_res, n_str)

    def test_chunk_sets_bit_equal(self, rng):
        from wealy_tpu.parallel.similarity import streaming_relevant_ranks

        S, smax, C = 23, 4, 8
        labels = np.arange(S) // 2
        sets = rng.normal(size=(S, smax, C)).astype(np.float32)
        mask = np.ones((S, smax), bool)
        mask[5, 2:] = False
        mask[12, 1:] = False
        args = dict(
            mode="cos", redux="bpwr", block_size=6, query_block=9,
            query_mask=mask, corpus_mask=mask,
        )
        r_res, n_res = streaming_relevant_ranks(
            sets, sets, labels, labels, resident=True, **args
        )
        r_str, n_str = streaming_relevant_ranks(
            sets, sets, labels, labels, resident=False, **args
        )
        np.testing.assert_array_equal(r_res, r_str)
        np.testing.assert_array_equal(n_res, n_str)

    def test_auto_respects_budget(self, rng):
        """A corpus over the resident budget must take the streamed path
        (observable via the jit call structure: we just assert identical
        results under a tiny budget, i.e. the fallback works)."""
        from wealy_tpu.parallel.similarity import streaming_relevant_ranks

        N, C = 40, 8
        labels = np.arange(N) // 2
        z = rng.normal(size=(N, C)).astype(np.float32)
        r_a, n_a = streaming_relevant_ranks(
            z, z, labels, labels, mode="cossim", block_size=8,
            query_block=8, resident="auto", resident_budget_mb=1e-9,
        )
        r_b, n_b = streaming_relevant_ranks(
            z, z, labels, labels, mode="cossim", block_size=8,
            query_block=8, resident=True,
        )
        np.testing.assert_array_equal(r_a, r_b)
        np.testing.assert_array_equal(n_a, n_b)


class TestStreamingBoundedMemory:
    def test_100k_corpus_bounded_rss(self, rng):
        """VERDICT round 1 item 2 'done' criterion: a 100K-song corpus streams
        within bounded RSS. SHS-test evaluation shape: ~10K queries ranked
        against the full 100K corpus (the full matrix would be 4 GB; an
        all-pairs 100K x 100K would be 40 GB); peak RSS growth must stay
        under 2 GB (state is O(Q*R) ~ 120 KB; transient device slabs
        (query_block, block_size) ~ 512 MB)."""
        import resource

        from wealy_tpu.parallel.similarity import (
            map_from_ranks,
            streaming_relevant_ranks,
        )

        N, Q, C = 100_000, 10_000, 8
        labels = np.repeat(np.arange(N // 4), 4)
        z = rng.normal(size=(N, C)).astype(np.float32)
        z += 2.5 * rng.normal(size=(N // 4, C)).astype(np.float32)[labels]

        rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
        ranks, n_rel = streaming_relevant_ranks(
            z[:Q], z, labels[:Q], labels, mode="cossim",
            block_size=16384, query_block=16384,
            query_idx=np.arange(Q), corpus_idx=np.arange(N),
            resident=False,  # this test PROVES the streamed path's bound
        )
        rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        growth_gib = (rss_after - rss_before) / (1024 ** 2)
        assert growth_gib < 2.0, f"RSS grew {growth_gib:.2f} GiB — not streaming"

        assert ranks.shape == (Q, 3)
        assert (n_rel == 3).all()
        m = map_from_ranks(ranks, n_rel)
        assert m["n_queries"] == Q
        # 25K clusters in 8-D overlap heavily, so absolute MAP is modest —
        # assert far above chance (3 relevant / 100K candidates => ~3e-5)
        assert m["MAP"] > 0.05


class TestHostShard:
    def test_round_robin_partition(self):
        from wealy_tpu.parallel.multihost import host_shard

        items = [f"v{i}" for i in range(11)]
        shards = [host_shard(items, process_index=i, process_count=3) for i in range(3)]
        # disjoint, complete, balanced to within one item
        assert sorted(sum(shards, [])) == sorted(items)
        assert {len(s) for s in shards} <= {3, 4}
        assert shards[0] == ["v0", "v3", "v6", "v9"]

    def test_single_process_identity(self):
        from wealy_tpu.parallel.multihost import host_shard

        items = list(range(5))
        assert host_shard(items) == items  # process_count()==1 in tests
