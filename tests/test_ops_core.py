"""Unit tests for the kernel core: neighbor search, windows, coordinate
mappings, fused continuous conv, ASCC antisymmetry & momentum conservation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcf_tpu.ops import (build_symmetric_kernel, continuous_conv,
                          fixed_radius_search, get_window_func,
                          masked_positions, point_sampling)
from dmcf_tpu.ops.coords import (map_ball_to_cube_radial,
                                 map_cylinder_to_cube, map_sphere_to_cylinder)

from reference_impls import (map_volume_preserving_np, naive_continuous_conv,
                             window_poly6)


def rand_points(n, seed, scale=1.0, dim=3):
    rng = np.random.RandomState(seed)
    p = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    if dim < 3:
        p[:, dim:] = 0.0
    return p


class TestNeighborSearch:
    def test_vs_bruteforce(self):
        pts = rand_points(200, 0)
        qry = rand_points(64, 1)
        r = 0.4
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry), r, k=64)
        d = np.sum((qry[:, None] - pts[None]) ** 2, axis=-1)
        for i in range(qry.shape[0]):
            expect = set(np.where(d[i] <= r * r)[0])
            got = set(np.asarray(nl.idx[i])[np.asarray(nl.mask[i])])
            assert got == expect
            assert int(nl.count[i]) == len(expect)
        # distances are squared L2
        di = np.asarray(nl.dist)
        mi = np.asarray(nl.mask)
        ii = np.asarray(nl.idx)
        for i in range(qry.shape[0]):
            for kk in range(64):
                if mi[i, kk]:
                    assert abs(di[i, kk] - d[i, ii[i, kk]]) < 1e-5

    def test_overflow_count(self):
        pts = np.zeros((10, 3), np.float32)
        qry = np.zeros((1, 3), np.float32)
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry), 0.1, k=4)
        assert int(nl.count[0]) == 10
        assert bool(nl.overflow[0])
        assert int(nl.mask.sum()) == 4

    def test_ignore_query_point(self):
        pts = rand_points(50, 2)
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), 0.5,
                                 k=64, ignore_query_point=True)
        idx = np.asarray(nl.idx)
        mask = np.asarray(nl.mask)
        for i in range(50):
            assert i not in set(idx[i][mask[i]])

    def test_masks(self):
        pts = rand_points(32, 3, scale=0.1)
        pmask = np.arange(32) < 20
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), 1.0,
                                 k=40, points_mask=jnp.asarray(pmask))
        idx = np.asarray(nl.idx)
        mask = np.asarray(nl.mask)
        assert np.all(idx[mask] < 20)

    def test_chunked_matches_unchunked(self):
        pts = rand_points(1000, 4)
        qry = rand_points(100, 5)
        a = fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry), 0.3, k=48,
                                chunk=64)
        b = fixed_radius_search(jnp.asarray(pts), jnp.asarray(qry), 0.3, k=48,
                                chunk=1000)
        assert np.array_equal(np.sort(np.where(a.mask, a.idx, -1), axis=1),
                              np.sort(np.where(b.mask, b.idx, -1), axis=1))


class TestCoordinateMapping:
    def test_radial_boundary(self):
        p = rand_points(100, 6)
        p = p / np.linalg.norm(p, axis=1, keepdims=True)  # unit sphere
        x, y, z = map_ball_to_cube_radial(*[jnp.asarray(p[:, i])
                                            for i in range(3)])
        linf = np.max(np.abs(np.stack([x, y, z], -1)), axis=-1)
        np.testing.assert_allclose(linf, 1.0, atol=1e-5)

    def test_volume_preserving_matches_naive(self):
        p = rand_points(200, 7, scale=0.6)
        x, y, z = map_sphere_to_cylinder(*[jnp.asarray(p[:, i])
                                           for i in range(3)])
        x, y, z = map_cylinder_to_cube(x, y, z)
        got = np.stack([x, y, z], axis=-1)
        want = np.stack([map_volume_preserving_np(pi) for pi in p])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_volume_preserving_stays_in_cube(self):
        p = rand_points(500, 8, scale=0.57)  # inside unit ball mostly
        norms = np.linalg.norm(p, axis=1)
        p = p[norms <= 1.0]
        x, y, z = map_sphere_to_cylinder(*[jnp.asarray(p[:, i])
                                           for i in range(3)])
        x, y, z = map_cylinder_to_cube(x, y, z)
        m = np.stack([x, y, z], -1)
        assert np.max(np.abs(m)) <= 1.0 + 1e-5

    def test_mapping_is_odd(self):
        p = rand_points(100, 9, scale=0.5)
        pj = [jnp.asarray(p[:, i]) for i in range(3)]
        nj = [jnp.asarray(-p[:, i]) for i in range(3)]
        a = map_cylinder_to_cube(*map_sphere_to_cylinder(*pj))
        b = map_cylinder_to_cube(*map_sphere_to_cylinder(*nj))
        for u, v in zip(a, b):
            np.testing.assert_allclose(np.asarray(u), -np.asarray(v),
                                       atol=1e-6)


class TestContinuousConv:
    @pytest.mark.parametrize("mapping", ["ball_to_cube_radial",
                                         "ball_to_cube_volume_preserving",
                                         "identity"])
    @pytest.mark.parametrize("normalize", [False, True])
    def test_vs_naive(self, mapping, normalize):
        """Semantic equivalence with the O(QN) oracle, checked in float64.

        (In float32 both implementations carry ~1e-3 cancellation noise on
        zero-mean random features — that is inherent to the arithmetic, not a
        semantic difference; see test_vs_naive_fp32.)
        """
        rng = np.random.RandomState(10)
        inp = rand_points(60, 11, scale=0.5).astype(np.float64)
        out = rand_points(20, 12, scale=0.5).astype(np.float64)
        feats = rng.randn(60, 4)
        kernel = rng.randn(2, 3, 4, 4, 5) * 0.1
        ext = 0.7
        win = get_window_func("poly6")
        with jax.enable_x64(True):
            nl = fixed_radius_search(jnp.asarray(inp), jnp.asarray(out),
                                     ext / 2, k=64)
            got = np.asarray(
                continuous_conv(jnp.asarray(kernel), jnp.asarray(out),
                                jnp.asarray(inp), jnp.asarray(feats), nl, ext,
                                window_fn=win, coordinate_mapping=mapping,
                                normalize=normalize))
        want = naive_continuous_conv(kernel, out, inp, feats, ext,
                                     window=window_poly6, mapping=mapping,
                                     normalize=normalize)
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_vs_naive_fp32(self):
        rng = np.random.RandomState(10)
        inp = rand_points(60, 11, scale=0.5)
        out = rand_points(20, 12, scale=0.5)
        feats = rng.randn(60, 4).astype(np.float32)
        kernel = rng.randn(2, 3, 4, 4, 5).astype(np.float32) * 0.1
        ext = 0.7
        win = get_window_func("poly6")
        nl = fixed_radius_search(jnp.asarray(inp), jnp.asarray(out),
                                 ext / 2, k=64)
        got = continuous_conv(jnp.asarray(kernel), jnp.asarray(out),
                              jnp.asarray(inp), jnp.asarray(feats), nl, ext,
                              window_fn=win,
                              coordinate_mapping="ball_to_cube_radial")
        want = naive_continuous_conv(kernel, out, inp, feats, ext,
                                     window=window_poly6,
                                     mapping="ball_to_cube_radial")
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)

    def test_kernel_size_one_axis(self):
        # 2D configs use kernel_size [1, 8, 8]: z axis has size 1
        rng = np.random.RandomState(13)
        inp = rand_points(50, 14, scale=0.5, dim=2)
        feats = rng.randn(50, 3).astype(np.float32)
        kernel = rng.randn(1, 8, 8, 3, 2).astype(np.float32) * 0.1
        ext = 0.6
        with jax.enable_x64(True):
            inp64 = jnp.asarray(inp, jnp.float64)
            nl = fixed_radius_search(inp64, inp64, ext / 2, k=64)
            got = np.asarray(
                continuous_conv(jnp.asarray(kernel, jnp.float64), inp64,
                                inp64, jnp.asarray(feats, jnp.float64), nl,
                                ext, window_fn=get_window_func("poly6")))
        want = naive_continuous_conv(kernel, inp, inp, feats, ext,
                                     window=window_poly6)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_padded_invariance(self):
        """Padding points must not change results for valid queries."""
        rng = np.random.RandomState(15)
        inp = rand_points(40, 16, scale=0.5)
        feats = rng.randn(40, 4).astype(np.float32)
        kernel = rng.randn(4, 4, 4, 4, 3).astype(np.float32) * 0.1
        ext = 0.5

        nl = fixed_radius_search(jnp.asarray(inp), jnp.asarray(inp), ext / 2,
                                 k=48)
        base = continuous_conv(jnp.asarray(kernel), jnp.asarray(inp),
                               jnp.asarray(inp), jnp.asarray(feats), nl, ext,
                               window_fn=get_window_func("poly6"))

        n_pad = 64
        mask = jnp.asarray(np.arange(n_pad) < 40)
        inp_p = np.zeros((n_pad, 3), np.float32)
        inp_p[:40] = inp
        inp_p = masked_positions(jnp.asarray(inp_p), mask)
        feats_p = np.zeros((n_pad, 4), np.float32)
        feats_p[:40] = feats
        nl_p = fixed_radius_search(inp_p, inp_p, ext / 2, k=48,
                                   points_mask=mask, queries_mask=mask)
        got = continuous_conv(jnp.asarray(kernel), inp_p, inp_p,
                              jnp.asarray(feats_p), nl_p, ext,
                              window_fn=get_window_func("poly6"))
        np.testing.assert_allclose(np.asarray(got)[:40], np.asarray(base),
                                   atol=1e-5)


class TestASCC:
    def make_sym_kernel(self, seed, shape=(2, 3, 4), cin=4, cout=3,
                        sym_axis=2):
        rng = np.random.RandomState(seed)
        half = list(shape)
        full = list(shape)
        full[sym_axis] *= 2
        k_half = rng.randn(*half, cin, cout).astype(np.float32) * 0.1
        return k_half, tuple(full)

    def test_antisymmetric_kernel_property(self):
        k_half, full = self.make_sym_kernel(20)
        k = np.asarray(build_symmetric_kernel(jnp.asarray(k_half), 2))
        assert k.shape[:3] == full
        # G(-x) = -G(x): full flip of all spatial axes negates the kernel
        np.testing.assert_allclose(k[::-1, ::-1, ::-1], -k, atol=0)

    def test_symmetric_conv_vs_naive(self):
        rng = np.random.RandomState(21)
        pts = rand_points(40, 22, scale=0.4)
        feats = rng.randn(40, 4).astype(np.float32)
        k_half, _ = self.make_sym_kernel(23)
        kernel = build_symmetric_kernel(jnp.asarray(k_half), 2)
        ext = 0.5
        win = get_window_func("peak")
        with jax.enable_x64(True):
            pts64 = jnp.asarray(pts, jnp.float64)
            f64 = jnp.asarray(feats, jnp.float64)
            nl = fixed_radius_search(pts64, pts64, ext / 2, k=64,
                                     ignore_query_point=True)
            got = np.asarray(
                continuous_conv(jnp.asarray(kernel, jnp.float64), pts64,
                                pts64, f64, nl, ext, window_fn=win,
                                symmetric=True, query_features=f64))
        def win_np(q):
            s = np.sqrt(q)
            return 1.0 - 2.0 * s + q
        want = naive_continuous_conv(np.asarray(kernel), pts, pts, feats, ext,
                                     window=win_np, ignore_query_point=True,
                                     symmetric=True, query_feats=feats)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_momentum_conservation(self):
        """Sum over particles of the ASCC output vanishes (the signature
        property: exact pairwise momentum exchange)."""
        rng = np.random.RandomState(24)
        pts = rand_points(200, 25, scale=0.4)
        feats = np.abs(rng.randn(200, 6)).astype(np.float32)
        k_half = rng.randn(4, 4, 2, 6, 3).astype(np.float32) * 0.1
        kernel = build_symmetric_kernel(jnp.asarray(k_half), 2)
        ext = 0.3
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), ext / 2,
                                 k=64, ignore_query_point=True)
        out = continuous_conv(kernel, jnp.asarray(pts), jnp.asarray(pts),
                              jnp.asarray(feats), nl, ext,
                              window_fn=get_window_func("peak"),
                              symmetric=True,
                              query_features=jnp.asarray(feats))
        total = np.asarray(jnp.sum(out, axis=0))
        scale = np.sum(np.abs(np.asarray(out))) + 1e-9
        assert np.all(np.abs(total) / scale < 1e-5), total

    def test_momentum_conservation_2d_config_shape(self):
        """WBC-SPH shape: kernel [1,8,8], sym_axis=1, 2D points."""
        rng = np.random.RandomState(26)
        pts = rand_points(150, 27, scale=0.3, dim=2)
        feats = np.abs(rng.randn(150, 8)).astype(np.float32)
        k_half = rng.randn(1, 4, 8, 8, 2).astype(np.float32) * 0.1
        kernel = build_symmetric_kernel(jnp.asarray(k_half), 1)
        ext = 0.2
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), ext / 2,
                                 k=64, ignore_query_point=True)
        out = continuous_conv(kernel, jnp.asarray(pts), jnp.asarray(pts),
                              jnp.asarray(feats), nl, ext,
                              window_fn=get_window_func("peak"),
                              symmetric=True,
                              query_features=jnp.asarray(feats))
        total = np.asarray(jnp.sum(out, axis=0))
        scale = np.sum(np.abs(np.asarray(out))) + 1e-9
        assert np.all(np.abs(total) / scale < 1e-5), total


class TestDenseConv:
    """continuous_conv_dense: the no-neighbor-list conv path for wide pairs
    (exact by construction — every source point is a candidate, no K budget).
    Used by PBFNet.dense_pair_min_k for downsampling trunk pairs."""

    def _setup(self, seed=1, n=64, q=40, cin=8, cout=12, radius=0.35):
        rng = np.random.RandomState(seed)
        pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        qs = rng.uniform(0, 1, (q, 3)).astype(np.float32)
        feats = rng.randn(n, cin).astype(np.float32)
        kernel = (rng.randn(4, 4, 4, cin, cout) * 0.1).astype(np.float32)
        return pts, qs, feats, kernel, radius

    def test_matches_neighbor_list_conv(self):
        from dmcf_tpu.ops.cconv import continuous_conv_dense
        pts, qs, feats, kernel, radius = self._setup()
        win = get_window_func("poly6")
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(qs),
                                 radius, k=64)
        want = continuous_conv(jnp.asarray(kernel), jnp.asarray(qs),
                               jnp.asarray(pts), jnp.asarray(feats), nl,
                               2 * radius, window_fn=win,
                               precision="highest")
        rel = (jnp.asarray(pts)[None, :, :]
               - jnp.asarray(qs)[:, None, :]) / radius
        d2 = jnp.sum(rel * rel, axis=-1)
        a = jnp.where(d2 <= 1.0, win(d2), 0.0)
        got = continuous_conv_dense(jnp.asarray(kernel), rel, a,
                                    jnp.asarray(feats), precision="highest")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_masked_sources_contribute_zero(self):
        from dmcf_tpu.ops.cconv import continuous_conv_dense
        pts, qs, feats, kernel, radius = self._setup(seed=3)
        win = get_window_func("poly6")
        rel = (jnp.asarray(pts)[None, :, :]
               - jnp.asarray(qs)[:, None, :]) / radius
        d2 = jnp.sum(rel * rel, axis=-1)
        mask = np.ones((pts.shape[0],), bool)
        mask[::3] = False
        valid = (d2 <= 1.0) & jnp.asarray(mask)[None, :]
        a = jnp.where(valid, win(d2), 0.0)
        got = continuous_conv_dense(jnp.asarray(kernel), rel, a,
                                    jnp.asarray(feats), precision="highest")
        # oracle: drop the masked sources entirely
        keep = np.where(mask)[0]
        nl = fixed_radius_search(jnp.asarray(pts[keep]), jnp.asarray(qs),
                                 radius, k=64)
        want = continuous_conv(jnp.asarray(kernel), jnp.asarray(qs),
                               jnp.asarray(pts[keep]),
                               jnp.asarray(feats[keep]), nl, 2 * radius,
                               window_fn=win, precision="highest")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_n_chunk_matches_unchunked(self):
        """n_chunk (source-dim scan) must reproduce the unchunked result
        to fp-summation tolerance — including a non-dividing chunk width
        (padding path) — and keep grads finite."""
        from dmcf_tpu.ops.cconv import continuous_conv_dense
        pts, qs, feats, kernel, radius = self._setup(seed=7)
        win = get_window_func("poly6")
        rel = (jnp.asarray(pts)[None, :, :]
               - jnp.asarray(qs)[:, None, :]) / radius
        d2 = jnp.sum(rel * rel, axis=-1)
        a = jnp.where(d2 <= 1.0, win(d2), 0.0)
        want = continuous_conv_dense(jnp.asarray(kernel), rel, a,
                                     jnp.asarray(feats),
                                     precision="highest")
        for chunk in (16, 24):  # 24 does not divide n=64 -> padding
            got = continuous_conv_dense(jnp.asarray(kernel), rel, a,
                                        jnp.asarray(feats),
                                        precision="highest", n_chunk=chunk)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-6)

        def loss(k):
            out = continuous_conv_dense(k, rel, a, jnp.asarray(feats),
                                        precision="highest", n_chunk=24)
            return jnp.sum(out ** 2)
        g = jax.grad(loss)(jnp.asarray(kernel))
        assert bool(jnp.all(jnp.isfinite(g)))
        g_ref = jax.grad(lambda k: jnp.sum(continuous_conv_dense(
            k, rel, a, jnp.asarray(feats), precision="highest") ** 2))(
            jnp.asarray(kernel))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_lazy_matches_eager_dense(self):
        """continuous_conv_dense_lazy (deferred [Q, N] geometry, canyon-
        scale path) must match the eager dense conv exactly: same validity
        arithmetic (unscaled d2 <= r^2), same window fold, same
        sanitization — values AND kernel grads, chunked and unchunked,
        with masked sources and far-sentinel padded rows."""
        from dmcf_tpu.ops.cconv import (continuous_conv_dense,
                                        continuous_conv_dense_lazy)
        pts, qs, feats, kernel, radius = self._setup(seed=11)
        win = get_window_func("poly6")
        # masked rows at a far sentinel (the real padding regime)
        smask = np.ones((pts.shape[0],), bool)
        smask[::5] = False
        pts = pts.copy()
        pts[~smask] = 1e8
        qmask = np.ones((qs.shape[0],), bool)
        qmask[3] = False

        rel = (jnp.asarray(pts)[None, :, :]
               - jnp.asarray(qs)[:, None, :]) / radius
        d2u = jnp.sum((jnp.asarray(pts)[None, :, :]
                       - jnp.asarray(qs)[:, None, :]) ** 2, axis=-1)
        valid = (d2u <= radius * radius) & jnp.asarray(smask)[None, :] \
            & jnp.asarray(qmask)[:, None]
        rel = jnp.where(valid[..., None], rel, 1.0)
        a = jnp.where(valid, win(jnp.where(valid, d2u / radius ** 2, 2.0)),
                      0.0)
        want = continuous_conv_dense(jnp.asarray(kernel), rel, a,
                                     jnp.asarray(feats), precision="highest")
        for chunk in (0, 24):
            got = continuous_conv_dense_lazy(
                jnp.asarray(kernel), jnp.asarray(pts), jnp.asarray(smask),
                jnp.asarray(qs), jnp.asarray(qmask), radius,
                jnp.asarray(feats), window_fn=win, precision="highest",
                n_chunk=chunk)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-6)

        def loss(k):
            out = continuous_conv_dense_lazy(
                k, jnp.asarray(pts), jnp.asarray(smask), jnp.asarray(qs),
                jnp.asarray(qmask), radius, jnp.asarray(feats),
                window_fn=win, precision="highest", n_chunk=24)
            return jnp.sum(out ** 2)
        g = jax.grad(loss)(jnp.asarray(kernel))
        assert bool(jnp.all(jnp.isfinite(g)))
        g_ref = jax.grad(lambda k: jnp.sum(continuous_conv_dense(
            k, rel, a, jnp.asarray(feats), precision="highest") ** 2))(
            jnp.asarray(kernel))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

        # position grads through the recomputed geometry stay finite
        # (sanitization pins invalid pairs to harmless geometry)
        gp = jax.grad(lambda q_: jnp.sum(continuous_conv_dense_lazy(
            jnp.asarray(kernel), jnp.asarray(pts), jnp.asarray(smask),
            q_, jnp.asarray(qmask), radius, jnp.asarray(feats),
            window_fn=win, precision="highest", n_chunk=24) ** 2))(
            jnp.asarray(qs))
        assert bool(jnp.all(jnp.isfinite(gp)))

    def test_bf16_fast_path_close(self):
        from dmcf_tpu.ops.cconv import continuous_conv_dense
        pts, qs, feats, kernel, radius = self._setup(seed=5)
        win = get_window_func("poly6")
        rel = (jnp.asarray(pts)[None, :, :]
               - jnp.asarray(qs)[:, None, :]) / radius
        d2 = jnp.sum(rel * rel, axis=-1)
        a = jnp.where(d2 <= 1.0, win(d2), 0.0)
        hi = continuous_conv_dense(jnp.asarray(kernel), rel, a,
                                   jnp.asarray(feats), precision="highest")
        fast = continuous_conv_dense(jnp.asarray(kernel), rel, a,
                                     jnp.asarray(feats),
                                     precision="default")
        scale = np.abs(np.asarray(hi)).max()
        assert np.abs(np.asarray(fast) - np.asarray(hi)).max() < 2e-2 * scale


class TestOnehotGather:
    def test_onehot_gather_matches_row_gather(self):
        from dmcf_tpu.ops.cconv import _onehot_gather
        rng = np.random.RandomState(7)
        feats = rng.randn(50, 6).astype(np.float32)
        idx = rng.randint(0, 50, size=(20, 8)).astype(np.int32)
        got = _onehot_gather(jnp.asarray(feats), jnp.asarray(idx),
                             jnp.bfloat16)
        want = jnp.asarray(feats).astype(jnp.bfloat16)[jnp.asarray(idx)]
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))


class TestPointSampling:
    def test_weighted_mean(self):
        rng = np.random.RandomState(30)
        inp = rand_points(30, 31, scale=0.3)
        out = rand_points(10, 32, scale=0.3)
        feats = rng.randn(30, 5).astype(np.float32)
        ext = 0.5
        win = get_window_func("poly6")
        nl = fixed_radius_search(jnp.asarray(inp), jnp.asarray(out), ext / 2,
                                 k=40)
        got = point_sampling(jnp.asarray(feats), nl, ext, window_fn=win,
                             normalize=True)
        r = ext / 2
        d = np.sum((out[:, None] - inp[None]) ** 2, -1)
        for i in range(10):
            sel = d[i] <= r * r
            w = window_poly6(d[i][sel] / (r * r))
            if w.sum() > 1e-9:
                want = (w[:, None] * feats[sel]).sum(0) / w.sum()
            else:
                want = np.zeros(5)
            np.testing.assert_allclose(np.asarray(got[i]), want, atol=1e-5)


class TestGrads:
    def test_grads_finite_at_coincident_pairs(self):
        """Regression: ball->cube mappings / windows at rel==0 (self pairs)
        must have finite gradients (jnp.where still differentiates the
        untaken branch)."""
        pts = rand_points(20, 50, scale=0.1)
        pts[1] = pts[0]  # exact coincidence between distinct particles
        feats = np.ones((20, 3), np.float32)
        kernel = np.full((2, 2, 2, 3, 3), 0.1, np.float32)
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), 0.3,
                                 k=32)  # self pairs INCLUDED

        for mapping in ("ball_to_cube_radial",
                        "ball_to_cube_volume_preserving"):
            for wname in ("poly6", "peak", "linear", "cubic"):
                def loss(x):
                    y = continuous_conv(
                        jnp.asarray(kernel), x, x, jnp.asarray(feats), nl,
                        0.6, window_fn=get_window_func(wname),
                        coordinate_mapping=mapping)
                    return jnp.sum(y ** 2)
                g = jax.grad(loss)(jnp.asarray(pts))
                assert np.all(np.isfinite(np.asarray(g))), (mapping, wname)

    def test_conv_differentiable(self):
        rng = np.random.RandomState(40)
        pts = rand_points(30, 41, scale=0.4)
        feats = rng.randn(30, 4).astype(np.float32)
        kernel = rng.randn(2, 2, 2, 4, 3).astype(np.float32) * 0.1
        ext = 0.5
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts), ext / 2,
                                 k=32)

        def loss(kern, f):
            y = continuous_conv(kern, jnp.asarray(pts), jnp.asarray(pts), f,
                                nl, ext, window_fn=get_window_func("poly6"))
            return jnp.sum(y ** 2)

        gk, gf = jax.grad(loss, argnums=(0, 1))(jnp.asarray(kernel),
                                                jnp.asarray(feats))
        assert np.all(np.isfinite(np.asarray(gk)))
        assert np.all(np.isfinite(np.asarray(gf)))
        assert float(jnp.sum(jnp.abs(gk))) > 0


def test_select_k_valid_sort_matches_searchsorted():
    """Wide-K budgets use a sort-based compaction; both methods must pick
    the identical (first-K ascending) column sets."""
    from dmcf_tpu.ops.neighbors import select_k_valid
    rng = np.random.RandomState(7)
    valid = jnp.asarray(rng.rand(37, 211) < 0.3)
    dist = jnp.asarray(rng.rand(37, 211).astype(np.float32))
    for k in (8, 64, 200, 256):
        a = select_k_valid(valid, dist, k, method="searchsorted")
        b = select_k_valid(valid, dist, k, method="sort")
        for x, y in zip(a, b):
            if x is not None:
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
