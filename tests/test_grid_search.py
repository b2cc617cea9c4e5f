"""Cell-list neighbor search vs brute-force oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from dmcf_tpu.ops.grid_search import grid_fixed_radius_search
from dmcf_tpu.ops.neighbors import fixed_radius_search, \
    invert_neighbors_list, search


def neighbor_sets(nl):
    idx = np.asarray(nl.idx)
    mask = np.asarray(nl.mask)
    return [set(idx[i][mask[i]].tolist()) for i in range(idx.shape[0])]


class TestGridSearch:
    @pytest.mark.parametrize("dim,planar", [(3, None), (2, 2)])
    def test_matches_bruteforce_random(self, dim, planar):
        rng = np.random.RandomState(0)
        pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        qry = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        if dim == 2:
            pts[:, 2] = 0
            qry[:, 2] = 0
        r = 0.15
        a = grid_fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry), r,
                                     k=64, cell_cap=64, planar_axis=planar)
        b = fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry), r, k=64)
        assert neighbor_sets(a) == neighbor_sets(b)
        np.testing.assert_array_equal(np.asarray(a.count),
                                      np.asarray(b.count))

    def test_clustered_data(self):
        """Dense clusters stress cell occupancy and hash ranges."""
        rng = np.random.RandomState(1)
        centers = rng.uniform(-5, 5, (10, 3))
        pts = np.concatenate([
            c + rng.normal(scale=0.05, size=(50, 3)) for c in centers
        ]).astype(np.float32)
        r = 0.12
        a = grid_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), r,
                                     k=96, cell_cap=128)
        b = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), r, k=96)
        assert neighbor_sets(a) == neighbor_sets(b)

    def test_masks_and_ignore(self):
        rng = np.random.RandomState(2)
        pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        pmask = np.arange(100) < 70
        qmask = np.arange(100) < 60
        a = grid_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                     0.4, k=96, cell_cap=96,
                                     points_mask=jnp.asarray(pmask),
                                     queries_mask=jnp.asarray(qmask),
                                     ignore_query_point=True)
        b = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), 0.4,
                                k=96, points_mask=jnp.asarray(pmask),
                                queries_mask=jnp.asarray(qmask),
                                ignore_query_point=True)
        assert neighbor_sets(a) == neighbor_sets(b)

    def test_query_chunking(self):
        rng = np.random.RandomState(3)
        pts = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
        qry = rng.uniform(-1, 1, (250, 3)).astype(np.float32)
        a = grid_fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry),
                                     0.2, k=48, cell_cap=64, query_chunk=64)
        b = grid_fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry),
                                     0.2, k=48, cell_cap=64,
                                     query_chunk=8192)
        assert neighbor_sets(a) == neighbor_sets(b)

    def test_distances_are_squared_l2(self):
        rng = np.random.RandomState(4)
        pts = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
        nl = grid_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                      0.5, k=64, cell_cap=64)
        idx = np.asarray(nl.idx)
        mask = np.asarray(nl.mask)
        dist = np.asarray(nl.dist)
        for i in range(50):
            for j in range(64):
                if mask[i, j]:
                    d = np.sum((pts[i] - pts[idx[i, j]]) ** 2)
                    assert abs(d - dist[i, j]) < 1e-5


class TestSearchDispatch:
    def test_auto_selects_and_agrees(self):
        rng = np.random.RandomState(5)
        pts = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
        a = search(jnp.asarray(pts), jnp.asarray(pts), 0.3, 64,
                   method="grid", cell_cap=96)
        b = search(jnp.asarray(pts), jnp.asarray(pts), 0.3, 64,
                   method="brute")
        assert neighbor_sets(a) == neighbor_sets(b)


class TestInvertNeighbors:
    def test_transpose_property(self):
        rng = np.random.RandomState(6)
        pts = rng.uniform(-1, 1, (80, 3)).astype(np.float32)
        qry = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry), 0.5,
                                 k=80)
        inv = invert_neighbors_list(nl, 80, 64)
        fwd = neighbor_sets(nl)
        rev = neighbor_sets(inv)
        for qi in range(40):
            for pi in fwd[qi]:
                assert qi in rev[pi]
        for pi in range(80):
            for qi in rev[pi]:
                assert pi in fwd[qi]


class TestContactWeight:
    def test_superset_of_true_contact_and_bounded(self):
        """weight > 0 for every query within radius of a point (exact
        guarantee); weight == 0 for queries beyond 2*sqrt(3)*radius of all
        points (cell-neighborhood bound, modulo hash collisions which this
        fixed seed does not hit)."""
        import jax.numpy as jnp

        from dmcf_tpu.ops.grid_search import contact_weight

        rng = np.random.RandomState(0)
        pts = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
        qs = rng.uniform(-4, 4, (500, 3)).astype(np.float32)
        r = 0.25
        w = np.asarray(contact_weight(jnp.asarray(pts), jnp.asarray(qs), r))
        d = np.sqrt(((qs[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
        dmin = d.min(1)
        assert np.all(w[dmin <= r] > 0)
        assert np.all(w[dmin > 2 * np.sqrt(3.0) * r] == 0)

    def test_masks(self):
        import jax.numpy as jnp

        from dmcf_tpu.ops.grid_search import contact_weight

        pts = np.zeros((4, 3), np.float32)
        qs = np.zeros((3, 3), np.float32)
        pm = np.array([True, True, False, False])
        qm = np.array([True, False, True])
        w = np.asarray(contact_weight(
            jnp.asarray(pts), jnp.asarray(qs), 0.5,
            points_mask=jnp.asarray(pm), queries_mask=jnp.asarray(qm)))
        assert w[0] == 2 and w[1] == 0 and w[2] == 2
