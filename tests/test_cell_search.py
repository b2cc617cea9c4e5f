"""Sorted-window cell search (ops/cell_search.py) vs brute-force oracle —
the TPU-fast large-scene search that replaced the hash-probe grid search
on the canyon profile (see the module docstring for the numbers)."""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from dmcf_tpu.ops import cell_search
from dmcf_tpu.ops.cell_search import contact_weight_dense
from dmcf_tpu.ops.neighbors import fixed_radius_search

# jit as used in practice (eager per-op dispatch of the search's sort
# pipeline is pointlessly slow in tests)
cell_fixed_radius_search = jax.jit(
    cell_search.cell_fixed_radius_search,
    static_argnames=("k", "metric", "ignore_query_point", "occ_cap",
                     "block_q", "block_chunk"))


def neighbor_sets(nl):
    idx = np.asarray(nl.idx)
    mask = np.asarray(nl.mask)
    return [set(idx[i][mask[i]].tolist()) for i in range(idx.shape[0])]


class TestCellSearch:
    @pytest.mark.parametrize("dim", [3, 2])
    def test_matches_bruteforce_random(self, dim):
        rng = np.random.RandomState(0)
        pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        qry = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        if dim == 2:
            pts[:, 2] = 0
            qry[:, 2] = 0
        r = 0.15
        a = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry), r,
                                     k=64, occ_cap=64)
        b = fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry), r, k=64)
        assert int(jnp.max(a.cell_overflow)) == 0
        assert neighbor_sets(a) == neighbor_sets(b)
        np.testing.assert_array_equal(np.asarray(a.count),
                                      np.asarray(b.count))

    def test_clustered_data(self):
        """Dense clusters stress window occupancy; sparse inter-cluster
        queries stress the block-union windows."""
        rng = np.random.RandomState(1)
        centers = rng.uniform(-5, 5, (10, 3))
        pts = np.concatenate([
            c + rng.normal(scale=0.05, size=(50, 3)) for c in centers
        ]).astype(np.float32)
        r = 0.12
        a = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), r,
                                     k=96, occ_cap=192)
        b = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), r, k=96)
        assert int(jnp.max(a.cell_overflow)) == 0
        assert neighbor_sets(a) == neighbor_sets(b)

    def test_masks_and_ignore(self):
        rng = np.random.RandomState(2)
        pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        pmask = np.arange(100) < 70
        qmask = np.arange(100) < 60
        a = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                     0.4, k=96, occ_cap=96,
                                     points_mask=jnp.asarray(pmask),
                                     queries_mask=jnp.asarray(qmask),
                                     ignore_query_point=True)
        b = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), 0.4,
                                k=96, points_mask=jnp.asarray(pmask),
                                queries_mask=jnp.asarray(qmask),
                                ignore_query_point=True)
        assert neighbor_sets(a) == neighbor_sets(b)

    def test_block_chunking(self):
        rng = np.random.RandomState(3)
        pts = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
        qry = rng.uniform(-1, 1, (250, 3)).astype(np.float32)
        a = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry),
                                     0.2, k=48, occ_cap=64, block_q=8,
                                     block_chunk=4)
        b = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry),
                                     0.2, k=48, occ_cap=64)
        assert neighbor_sets(a) == neighbor_sets(b)

    def test_distances_are_squared_l2(self):
        rng = np.random.RandomState(4)
        pts = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
        nl = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                      0.5, k=64, occ_cap=64)
        idx = np.asarray(nl.idx)
        mask = np.asarray(nl.mask)
        dist = np.asarray(nl.dist)
        for i in range(50):
            for j in range(64):
                if mask[i, j]:
                    d = np.sum((pts[i] - pts[idx[i, j]]) ** 2)
                    np.testing.assert_allclose(dist[i, j], d, rtol=1e-5)

    def test_negative_coordinates_near_zero(self):
        """Cells straddling coordinate 0 exercise the min-shift (a naive
        mod-wrap misses neighbors whose true cell coord is negative)."""
        pts = np.asarray([[-0.01, 0.0, 0.0], [0.01, 0.0, 0.0],
                          [-0.01, -0.01, -0.01], [0.5, 0.5, 0.5]],
                         np.float32)
        a = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                     0.1, k=8)
        b = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), 0.1,
                                k=8)
        assert neighbor_sets(a) == neighbor_sets(b)

    def test_dense_single_cell(self):
        """More points in one cell than a block: dense cells split into
        several exact-window blocks, nothing is dropped."""
        pts = np.random.RandomState(5).uniform(
            0, 0.09, (200, 3)).astype(np.float32)
        a = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                     0.1, k=256, occ_cap=256, block_q=16)
        b = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), 0.1,
                                k=256)
        assert int(jnp.max(a.cell_overflow)) == 0
        assert neighbor_sets(a) == neighbor_sets(b)

    def test_window_overflow_reported(self):
        pts = np.random.RandomState(6).uniform(
            0, 0.09, (64, 3)).astype(np.float32)  # one dense cell
        nl = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                      0.1, k=96, occ_cap=8)
        assert int(jnp.max(nl.cell_overflow)) > 0

    def test_span_overflow_reported(self):
        pts = np.asarray([[0.0, 0, 0], [2000.0, 0, 0]], np.float32)
        nl = cell_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                      0.1, k=4)
        assert int(jnp.max(nl.cell_overflow)) >= (1 << 20)


class TestContactWeightDense:
    def test_exact_counts(self):
        rng = np.random.RandomState(7)
        pts = rng.uniform(-1, 1, (80, 3)).astype(np.float32)
        qry = rng.uniform(-1, 1, (120, 3)).astype(np.float32)
        r = 0.4
        w = np.asarray(contact_weight_dense(jnp.asarray(pts),
                                            jnp.asarray(qry), r))
        d2 = np.sum((qry[:, None] - pts[None]) ** 2, -1)
        np.testing.assert_array_equal(w, np.sum(d2 <= r * r, axis=1))

    def test_masks_and_chunking(self):
        rng = np.random.RandomState(8)
        pts = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
        qry = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        pmask = np.arange(60) < 40
        qmask = np.arange(100) < 70
        w1 = contact_weight_dense(jnp.asarray(pts), jnp.asarray(qry), 0.3,
                                  points_mask=jnp.asarray(pmask),
                                  queries_mask=jnp.asarray(qmask))
        w2 = contact_weight_dense(jnp.asarray(pts), jnp.asarray(qry), 0.3,
                                  points_mask=jnp.asarray(pmask),
                                  queries_mask=jnp.asarray(qmask),
                                  chunk=16)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        d2 = np.sum((qry[:, None] - pts[None, :40]) ** 2, -1)
        ref = np.where(qmask, np.sum(d2 <= 0.09, axis=1), 0)
        np.testing.assert_array_equal(np.asarray(w1), ref)


class TestRecomputeDistChunked:
    def test_chunked_equals_single_shot(self):
        """_recompute_dist past chunk_elems runs the [Q, K, 3] position
        gather K-chunked under lax.map (the unchunked gather's lane-padded
        output OOMs at canyon-demo Q*K) — same values, bounded transient."""
        from dmcf_tpu.ops.neighbors import _recompute_dist
        rng = np.random.RandomState(11)
        pts = jnp.asarray(rng.uniform(-1, 1, (200, 3)).astype(np.float32))
        qry = jnp.asarray(rng.uniform(-1, 1, (37, 3)).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 200, (37, 29)).astype(np.int32))
        mask = jnp.asarray(rng.rand(37, 29) < 0.8)
        for metric in ("L2", "L1", "Linf"):
            ref = _recompute_dist(pts, qry, idx, mask, metric)
            got = _recompute_dist(pts, qry, idx, mask, metric,
                                  chunk_elems=64)  # force ~17 chunks
            # 1-ULP tolerance: XLA fuses the sum-of-squares with FMA
            # differently inside the lax.map body
            np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                       rtol=2e-7, atol=0.0)
