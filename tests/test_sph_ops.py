"""SPH / sampling op tests: density, pressure, pooling, FPS, EMD,
nn_distance, prob_sample, transformed dx, align_vector."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from dmcf_tpu.ops import (align_vector, compute_density, compute_pressure,
                          compute_transformed_dx, farthest_point_sample,
                          get_window_func, grid_pos, nn_distance,
                          prob_sample)
from dmcf_tpu.ops.emd import approx_match, emd_loss


def rand_pts(n, seed, scale=0.5):
    return np.random.RandomState(seed).uniform(
        -scale, scale, (n, 3)).astype(np.float32)


class TestDensity:
    def test_vs_naive(self):
        pts = rand_pts(80, 0)
        r = 0.3
        win = get_window_func("poly6")
        dens = np.asarray(compute_density(jnp.asarray(pts),
                                          jnp.asarray(pts), r, win))
        d = np.sum((pts[:, None] - pts[None]) ** 2, -1)
        q = d / r**2
        w = np.clip((1 - q) ** 3, 0, 1) * (d <= r * r)
        np.testing.assert_allclose(dens, w.sum(1), atol=1e-4)

    def test_includes_self(self):
        pts = np.zeros((1, 3), np.float32)
        dens = compute_density(jnp.asarray(pts), jnp.asarray(pts), 0.1,
                               get_window_func("poly6"))
        assert abs(float(dens[0]) - 1.0) < 1e-6  # poly6(0) = 1

    def test_pressure_tait(self):
        dens = jnp.asarray([1.0, 3.5, 7.0])
        p = np.asarray(compute_pressure(dens, rest_dens=3.5, stiffness=20.0))
        assert p[0] == 0.0  # clamped below rest density
        assert abs(p[1]) < 1e-5
        np.testing.assert_allclose(p[2], 20.0 * (2.0**7 - 1), rtol=1e-5)


class TestNnDistance:
    def test_vs_kdtree(self):
        a = rand_pts(60, 1)
        b = rand_pts(40, 2)
        da, ia, db, ib = nn_distance(jnp.asarray(a), jnp.asarray(b))
        ta = cKDTree(b).query(a)[0] ** 2
        tb = cKDTree(a).query(b)[0] ** 2
        np.testing.assert_allclose(np.asarray(da), ta, atol=1e-5)
        np.testing.assert_allclose(np.asarray(db), tb, atol=1e-5)


class TestProbSample:
    def test_inverse_cdf(self):
        w = jnp.asarray([0.0, 1.0, 0.0, 3.0])
        u = jnp.asarray([0.1, 0.24, 0.26, 0.99])
        idx = np.asarray(prob_sample(w, u))
        np.testing.assert_array_equal(idx, [1, 1, 3, 3])


class TestFPS:
    def test_spreads_points(self):
        pts = rand_pts(100, 3)
        idx, mask = farthest_point_sample(jnp.asarray(pts),
                                          jnp.ones(100, bool), 10)
        sel = pts[np.asarray(idx)[np.asarray(mask)]]
        assert len(np.unique(np.asarray(idx))) == 10
        # FPS min pairwise distance should beat random selection on average
        def min_pair(x):
            d = np.sum((x[:, None] - x[None]) ** 2, -1)
            np.fill_diagonal(d, np.inf)
            return d.min()
        rnd = pts[np.random.RandomState(0).choice(100, 10, replace=False)]
        assert min_pair(sel) > min_pair(rnd)


class TestEMD:
    def test_identical_sets_near_zero(self):
        pts = rand_pts(50, 4)[None]
        loss = float(emd_loss(jnp.asarray(pts), jnp.asarray(pts))[0])
        assert loss < 1e-3

    def test_translation_cost(self):
        # shift >> cloud diameter: every matching costs ~ the shift
        pts = rand_pts(64, 5)[None]
        shifted = pts + np.array([5.0, 0, 0], np.float32)
        loss = float(emd_loss(jnp.asarray(pts), jnp.asarray(shifted))[0])
        assert abs(loss - 5.0) < 0.2

    def test_match_is_doubly_stochasticish(self):
        pts = rand_pts(32, 6)[None]
        other = rand_pts(32, 7)[None]
        m = np.asarray(approx_match(jnp.asarray(pts), jnp.asarray(other)))
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=0.05)
        np.testing.assert_allclose(m.sum(axis=2), 1.0, atol=0.05)

    def test_padded_counts(self):
        pts = np.zeros((1, 40, 3), np.float32)
        pts[0, :30] = rand_pts(30, 8)
        other = np.zeros((1, 36, 3), np.float32)
        other[0, :30] = rand_pts(30, 8)  # same points, padded differently
        loss = float(emd_loss(jnp.asarray(pts), jnp.asarray(other),
                              n=jnp.asarray([30]), m=jnp.asarray([30]))[0])
        assert loss < 1e-3


class TestTransformedDx:
    def test_uniform_scale_mean_offset(self):
        pts = rand_pts(50, 9, scale=0.2)
        mask = jnp.ones(50, bool)
        dx = compute_transformed_dx(jnp.asarray(pts), mask,
                                    scale=jnp.ones((50, 1)), radius=0.5)
        # with scale 1, dx = mean of neighbor offsets: finite, bounded by r
        assert np.all(np.isfinite(np.asarray(dx)))
        assert np.abs(np.asarray(dx)).max() <= 0.5


class TestAlignVector:
    def test_rotates_onto_target(self):
        """Contract (as used by the grav_eqvar transform,
        models/pbf_model.py:269-278): row-multiplying data by
        ``align_vector(target, actual)`` maps ``actual`` onto ``target``."""
        target = jnp.asarray([0.0, -1.0, 0.0])
        actual = jnp.asarray([3.0, -4.0, 0.0])
        R = align_vector(target, actual)
        got = np.asarray((actual / jnp.linalg.norm(actual)) @ R)
        np.testing.assert_allclose(got, np.asarray(target), atol=1e-6)

    def test_degenerate_parallel(self):
        v = jnp.asarray([0.0, -1.0, 0.0])
        R = align_vector(v, v)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        R2 = align_vector(v, -v)
        np.testing.assert_allclose(np.asarray(R2), -np.eye(3), atol=1e-6)


class TestGridPos:
    def test_voxel_centers(self):
        pts = jnp.asarray([[0.02, 0.02, 0.0], [0.08, 0.02, 0.0]],
                          dtype=jnp.float32)
        gp, gm, gc = grid_pos(pts, jnp.ones(2, bool), [0.05, 0.05, 0.0],
                              out_max=32, hyst=0.0)
        got = np.asarray(gp)[np.asarray(gm)]
        # cells (0,0) and (1,0) plus the +1 offsets from the 2-cell stamp
        assert int(gc) >= 2
        assert np.all(got[:, 2] == 0.0)
        # centers at half-voxel positions
        frac = (got[:, :2] / 0.05) % 1.0
        np.testing.assert_allclose(frac, 0.5, atol=1e-5)


class TestApproxVel:
    def test_identical_sets_zero_displacement(self):
        from dmcf_tpu.ops.emd import approx_vel
        pts = rand_pts(32, 20)[None]
        v = np.asarray(approx_vel(jnp.asarray(pts), jnp.asarray(pts)))
        assert np.abs(v).max() < 5e-3

    def test_translation_recovered(self):
        from dmcf_tpu.ops.emd import approx_vel
        pts = rand_pts(32, 21)[None]
        shifted = pts + np.array([3.0, 0, 0], np.float32)
        v = np.asarray(approx_vel(jnp.asarray(pts), jnp.asarray(shifted)))
        # soft matching blurs within the cloud extent (+-0.5 per axis)
        np.testing.assert_allclose(v[0, :, 0], 3.0, atol=1.0)
        assert abs(v[0, :, 0].mean() - 3.0) < 0.15


class TestGridPosBnds:
    def test_unique_round_cells(self):
        from dmcf_tpu.ops.sph import grid_pos_bnds
        pts = jnp.asarray([[0.01, 0.0, 0.0], [0.012, 0.0, 0.0],
                           [0.1, 0.0, 0.0]], dtype=jnp.float32)
        gp, gm, gc = grid_pos_bnds(pts, jnp.ones(3, bool),
                                   [0.05, 0.05, 0.05], out_max=8)
        assert int(gc) == 2  # first two round to the same cell


class TestGridPosFarRow:
    def test_valid_far_row_does_not_collapse_grid(self):
        """ADVICE r4: a single mask-TRUE far row (e.g. a leaked halo
        sentinel at ~2e9) used to wrap the int32 extent linearization
        negative and silently dedup the entire grid to ONE voxel.  The
        lexicographic dedup must keep every real voxel; the stray row may
        add at most a few garbage voxels of its own."""
        from dmcf_tpu.ops.sph import grid_pos
        rng = np.random.RandomState(0)
        pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
        mask = np.ones(64, bool)
        vs = [0.25, 0.25, 0.25]
        _, _, c_ref = grid_pos(jnp.asarray(pts), jnp.asarray(mask), vs, 512)

        bad = np.concatenate([pts, [[2e9, 2e9, 2e9]]], 0).astype(np.float32)
        bmask = np.ones(65, bool)
        _, _, c_bad = grid_pos(jnp.asarray(bad), jnp.asarray(bmask), vs, 512)
        assert int(c_bad) >= int(c_ref) > 8
        assert int(c_bad) <= int(c_ref) + 8
