"""Model-family tests: config -> module build, forward shapes, jit/vmap,
padding invariance, SymNet momentum conservation."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from dmcf_tpu.models import build_model
from dmcf_tpu.ops import masked_positions

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def make_sample(n=48, n_valid=40, b=24, b_valid=16, dim=2, seed=0,
                with_grav=True):
    rng = np.random.RandomState(seed)
    pos = np.zeros((n, 3), np.float32)
    pos[:n_valid] = rng.uniform(-0.2, 0.2, (n_valid, 3))
    vel = np.zeros((n, 3), np.float32)
    vel[:n_valid] = rng.randn(n_valid, 3) * 0.01
    box = np.zeros((b, 3), np.float32)
    box[:b_valid] = rng.uniform(-0.3, 0.3, (b_valid, 3))
    normals = np.zeros((b, 3), np.float32)
    normals[:b_valid, 1] = 1.0
    if dim < 3:
        pos[:, dim:] = 0
        vel[:, dim:] = 0
        box[:, dim:] = 0
    fluid_mask = np.arange(n) < n_valid
    box_mask = np.arange(b) < b_valid
    sample = {
        "pos": jnp.asarray(masked_positions(jnp.asarray(pos),
                                            jnp.asarray(fluid_mask))),
        "vel": jnp.asarray(vel),
        "box": jnp.asarray(box),
        "box_normals": jnp.asarray(normals),
        "fluid_mask": jnp.asarray(fluid_mask),
        "box_mask": jnp.asarray(box_mask),
    }
    if with_grav:
        g = np.zeros((n, 3), np.float32)
        g[:, 1] = -9.81
        sample["grav"] = jnp.asarray(g)
    return sample


def model_cfg(path):
    with open(path) as f:
        return yaml.safe_load(f)["model"]


ALL_CONFIGS = sorted(
    glob.glob(os.path.join(CONFIG_DIR, "*.yml"))
    + glob.glob(os.path.join(CONFIG_DIR, "*", "*.yml")))


class TestBuild:
    @pytest.mark.parametrize("path", ALL_CONFIGS,
                             ids=[os.path.basename(p) for p in ALL_CONFIGS])
    def test_build_and_init(self, path):
        cfg = model_cfg(path)
        model = build_model(cfg)
        sample = make_sample()
        params = model.init(jax.random.PRNGKey(0), sample, training=False)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(params))
        assert n_params > 0

    def test_forward_shapes_and_finiteness(self):
        cfg = model_cfg(os.path.join(CONFIG_DIR, "column", "symnet.yml"))
        model = build_model(cfg)
        sample = make_sample(dim=1, seed=1)
        params = model.init(jax.random.PRNGKey(0), sample, training=False)
        pos, vel, aux = model.apply(params, sample, training=False)
        assert pos.shape == sample["pos"].shape
        assert vel.shape == sample["vel"].shape
        fm = np.asarray(sample["fluid_mask"])
        assert np.all(np.isfinite(np.asarray(pos)[fm]))
        assert np.all(np.isfinite(np.asarray(vel)[fm]))
        assert aux["num_fluid_neighbors"].shape == (48,)

    def test_jit_and_vmap(self):
        cfg = model_cfg(os.path.join(CONFIG_DIR, "WaterRamps.yml"))
        cfg["neighbor_k"] = 32
        model = build_model(cfg)
        sample = make_sample(seed=2)
        params = model.init(jax.random.PRNGKey(0), sample, training=False)

        @jax.jit
        def step(params, s):
            return model.apply(params, s, training=False)

        pos, vel, aux = step(params, sample)
        assert np.all(np.isfinite(np.asarray(pos)[
            np.asarray(sample["fluid_mask"])]))

        batch = jax.tree.map(lambda *xs: jnp.stack(xs),
                             make_sample(seed=3), make_sample(seed=4))
        bpos, bvel, baux = jax.jit(jax.vmap(
            lambda s: model.apply(params, s, training=False)))(batch)
        assert bpos.shape[0] == 2


class TestPaddingInvariance:
    def test_more_padding_same_result(self):
        cfg = model_cfg(os.path.join(CONFIG_DIR, "column", "hrnet.yml"))
        model = build_model(cfg)
        s_small = make_sample(n=40, n_valid=32, b=16, b_valid=8, dim=1,
                              seed=5)
        params = model.init(jax.random.PRNGKey(0), s_small, training=False)
        pos_a, vel_a, _ = model.apply(params, s_small, training=False)

        s_big = make_sample(n=64, n_valid=32, b=32, b_valid=8, dim=1, seed=5)
        # identical valid data (same seed => same first rows)
        np.testing.assert_allclose(
            np.asarray(s_small["pos"])[:32], np.asarray(s_big["pos"])[:32])
        pos_b, vel_b, _ = model.apply(params, s_big, training=False)
        np.testing.assert_allclose(np.asarray(pos_a)[:32],
                                   np.asarray(pos_b)[:32], atol=1e-5)
        # vel = d(pos)/dt amplifies fp32 reduction-order noise by 1/dt (=400)
        np.testing.assert_allclose(np.asarray(vel_a)[:32],
                                   np.asarray(vel_b)[:32], atol=5e-3)


class TestBoundaryCrop:
    def test_crop_equivalent_when_capacity_sufficient(self):
        """With boundary_crop_max >= the in-range boundary count, the
        working-set crop must not change fluid outputs (it only drops
        out-of-range boundary particles, which have no fluid neighbors)."""
        cfg = model_cfg(os.path.join(CONFIG_DIR, "WaterRamps.yml"))
        cfg["neighbor_k"] = 32
        sample = make_sample(n=48, n_valid=40, b=64, b_valid=48, seed=11)
        ref_model = build_model(cfg)
        params = ref_model.init(jax.random.PRNGKey(0), sample,
                                training=False)
        ref_pos, ref_vel, _ = ref_model.apply(params, sample,
                                              training=False)

        for mode in ("contact", "aabb"):
            cfg["boundary_crop_max"] = 56  # >= all 48 valid boundary pts
            cfg["boundary_crop_mode"] = mode
            crop_model = build_model(cfg)
            pos, vel, aux = crop_model.apply(params, sample, training=False)
            fm = np.asarray(sample["fluid_mask"])
            np.testing.assert_allclose(np.asarray(pos)[fm],
                                       np.asarray(ref_pos)[fm], atol=1e-5,
                                       err_msg=mode)

    def test_contact_crop_survives_wide_aabb(self):
        """The failure mode that sank the canyon demo: fluid spread wide so
        the AABB covered (almost) all boundary and first-K slot-order
        truncation dropped the floor under the fluid.  Contact mode keeps
        the boundary near fluid regardless of how wide the AABB is."""
        import jax

        cfg = model_cfg(os.path.join(CONFIG_DIR, "WaterRamps.yml"))
        cfg["neighbor_k"] = 32
        rng = np.random.RandomState(3)
        # two fluid clumps far apart (wide AABB) resting near boundary
        # clusters; a long slab of irrelevant boundary in between fills the
        # AABB and precedes the relevant boundary in slot order
        n = 64
        fl = np.concatenate([
            rng.uniform(0.0, 0.1, (32, 3)),
            rng.uniform(3.0, 3.1, (32, 3))]).astype(np.float32)
        far = np.stack([np.linspace(0.5, 2.5, 96),
                        np.full(96, -5.0), np.zeros(96)],
                       -1).astype(np.float32)  # in AABB, far from fluid
        near = np.concatenate([
            rng.uniform(-0.05, 0.15, (16, 3)),
            rng.uniform(2.95, 3.15, (16, 3))]).astype(np.float32)
        box = np.concatenate([far, near])  # relevant boundary LAST
        sample = {
            "pos": fl, "vel": np.zeros_like(fl),
            "grav": np.tile(np.array([0, -9.81, 0], np.float32), (n, 1)),
            "box": box,
            "box_normals": np.tile(np.array([0, 1.0, 0], np.float32),
                                   (len(box), 1)),
            "fluid_mask": np.ones(n, bool),
            "box_mask": np.ones(len(box), bool),
        }
        sample = {k: np.asarray(v) for k, v in sample.items()}

        ref_model = build_model(dict(cfg))
        params = ref_model.init(jax.random.PRNGKey(0), sample,
                                training=False)
        ref_pos, _, _ = ref_model.apply(params, sample, training=False)

        cfg["boundary_crop_max"] = 64  # < 112 total, >= the ~32 contacted
        cfg["boundary_crop_mode"] = "contact"
        crop_model = build_model(cfg)
        pos, _, aux = crop_model.apply(params, sample, training=False)
        np.testing.assert_allclose(np.asarray(pos), np.asarray(ref_pos),
                                   atol=1e-5)
        assert int(aux["boundary_crop_count"]) <= 64


class TestMomentumConservation:
    def test_symnet_correction_sums_to_zero_without_boundary(self):
        """With no boundary particles, the ASCC position correction must sum
        to ~0 over the fluid (the paper's momentum-conservation guarantee)."""
        cfg = model_cfg(os.path.join(CONFIG_DIR, "Liquid3d.yml"))
        cfg["out_scale"] = [1.0, 1.0, 1.0]
        model = build_model(cfg)
        sample = make_sample(n=64, n_valid=64, b=8, b_valid=0, dim=3, seed=6)
        params = model.init(jax.random.PRNGKey(1), sample, training=False)
        _, _, aux = model.apply(params, sample, training=False)
        corr = np.asarray(aux["pos_correction"])
        total = np.abs(corr.sum(axis=0))
        scale = np.abs(corr).sum() + 1e-12
        assert np.all(total / scale < 1e-5), (total, scale)

    def test_grads_flow(self):
        cfg = model_cfg(os.path.join(CONFIG_DIR, "column", "symnet.yml"))
        model = build_model(cfg)
        sample = make_sample(dim=1, seed=7)
        params = model.init(jax.random.PRNGKey(0), sample, training=False)

        def loss(p):
            pos, vel, aux = model.apply(p, sample, training=True)
            fm = sample["fluid_mask"][:, None]
            return jnp.sum(jnp.where(fm, pos, 0.0) ** 2)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0


class TestPerPairNeighborK:
    """Cross-scale trunk pairs get their own K budgets
    (``model.neighbor_k_gaps``): a coarse-scale query at its larger radius
    sees ~(stride_j/stride_i)^dim finer-scale points — the reference's
    ragged lists consume all of them (utils/convolutions.py:352-373), so a
    single global K silently truncates exactly the convs that carry the
    downsampling path."""

    def _cfg(self):
        cfg = model_cfg(os.path.join(CONFIG_DIR, "WaterRamps.yml"))
        cfg.pop("neighbor_k_gaps", None)
        return cfg

    def test_overflow_surfaced_and_closed_by_gap_budgets(self):
        # dense 2D block: each scale-2 query (r=0.08) sees ~100+ scale-0
        # points — far beyond a global K of 24
        cfg = self._cfg()
        cfg["neighbor_k"] = 24
        sample = make_sample(n=256, n_valid=256, b=8, b_valid=4, dim=2,
                             seed=3)
        # rest-spacing grid (0.01) like the real scene
        g = np.stack(np.meshgrid(np.arange(16), np.arange(16),
                                 indexing="ij"), -1).reshape(-1, 2) * 0.01
        pos = np.zeros((256, 3), np.float32)
        pos[:, :2] = g
        sample = dict(sample)
        sample["pos"] = jnp.asarray(pos)
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), sample, training=False)
        _, _, aux = model.apply(params, sample, training=False)
        assert int(aux["pair_overflow"]) > 0  # global K=24 truncates

        cfg["neighbor_k_gaps"] = [128, 320]
        model2 = build_model(cfg)
        _, _, aux2 = model2.apply(params, sample, training=False)
        assert int(aux2["pair_overflow"]) <= 0  # budgets close the gap

    def test_gap_budgets_match_large_global_k(self):
        """With every budget at/above the true max count, per-pair K and a
        big global K are the same function (padding never changes values)."""
        sample = make_sample(n=96, n_valid=80, b=24, b_valid=16, dim=2,
                             seed=4)
        cfg = self._cfg()
        cfg["neighbor_k"] = 256
        ref = build_model(cfg)
        params = ref.init(jax.random.PRNGKey(2), sample, training=False)
        ref_pos, ref_vel, ref_aux = ref.apply(params, sample, training=False)
        assert int(ref_aux["pair_overflow"]) <= 0

        cfg2 = self._cfg()
        cfg2["neighbor_k"] = 256
        cfg2["neighbor_k_gaps"] = [256, 320]
        gap = build_model(cfg2)
        pos, vel, aux = gap.apply(params, sample, training=False)
        assert int(aux["pair_overflow"]) <= 0
        np.testing.assert_allclose(np.asarray(pos), np.asarray(ref_pos),
                                   rtol=0, atol=2e-6)

    def test_k_for_pair_resolution(self):
        cfg = self._cfg()
        cfg["neighbor_k"] = 32
        cfg["neighbor_k_gaps"] = [64, 224]
        m = build_model(cfg)
        assert m.k_for_pair(0, 0) == 32
        assert m.k_for_pair(1, 0) == 32   # upsampling: base K
        assert m.k_for_pair(0, 1) == 64
        assert m.k_for_pair(1, 2) == 64
        assert m.k_for_pair(0, 2) == 224


class TestDensePairPath:
    """``dense_pair_min_k``: trunk pairs at/above the threshold skip
    neighbor lists and run the conv densely over all source points
    (ops/cconv.continuous_conv_dense) — exact with no K budget."""

    def _grid_sample(self):
        sample = make_sample(n=256, n_valid=256, b=8, b_valid=4, dim=2,
                             seed=3)
        g = np.stack(np.meshgrid(np.arange(16), np.arange(16),
                                 indexing="ij"), -1).reshape(-1, 2) * 0.01
        pos = np.zeros((256, 3), np.float32)
        pos[:, :2] = g
        sample = dict(sample)
        sample["pos"] = jnp.asarray(pos)
        return sample

    def test_forward_matches_klist_path(self):
        sample = self._grid_sample()
        cfg = model_cfg(os.path.join(CONFIG_DIR, "WaterRamps.yml"))
        cfg["neighbor_k_gaps"] = [128, 320]  # exact K-list budgets
        cfg["dense_pair_min_k"] = 0
        ref = build_model(cfg)
        params = ref.init(jax.random.PRNGKey(7), sample, training=False)
        ref_pos, ref_vel, ref_aux = ref.apply(params, sample, training=False)
        assert int(ref_aux["pair_overflow"]) <= 0  # klist path is exact here

        cfg["dense_pair_min_k"] = 96
        dense = build_model(cfg)
        pos, vel, aux = dense.apply(params, sample, training=False)
        # dense pairs report a (dense) detail entry and cannot overflow
        assert any(k.endswith("(dense)")
                   for k in aux["pair_overflow_detail"])
        assert int(aux["pair_overflow"]) <= 0
        np.testing.assert_allclose(np.asarray(pos), np.asarray(ref_pos),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(vel), np.asarray(ref_vel),
                                   rtol=0, atol=2e-3)

    def test_lazy_dense_matches_eager_dense_model(self):
        """dense_lazy_min_elems=1 forces every dense pair through the
        deferred-geometry LazyDensePair path (canyon-scale regime); model
        outputs must match the eager dense path to fp-summation
        tolerance (the lazy conv always source-chunks)."""
        sample = self._grid_sample()
        cfg = model_cfg(os.path.join(CONFIG_DIR, "WaterRamps.yml"))
        cfg["dense_pair_min_k"] = 96
        eager = build_model(cfg)
        params = eager.init(jax.random.PRNGKey(7), sample, training=False)
        ref_pos, ref_vel, _ = eager.apply(params, sample, training=False)

        cfg["dense_lazy_min_elems"] = 1
        lazy = build_model(cfg)
        pos, vel, aux = lazy.apply(params, sample, training=False)
        assert int(aux["pair_overflow"]) <= 0
        np.testing.assert_allclose(np.asarray(pos), np.asarray(ref_pos),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(vel), np.asarray(ref_vel),
                                   rtol=0, atol=2e-3)

        # training grads flow through the recomputed geometry and match
        def loss(m, pr):
            p, v, _ = m.apply(pr, sample, training=True)
            return jnp.mean(jnp.where(np.asarray(sample["fluid_mask"])
                                      [:, None], p, 0.0) ** 2)
        g_e = jax.grad(lambda pr: loss(eager, pr))(params)
        g_l = jax.grad(lambda pr: loss(lazy, pr))(params)
        flat_e = jax.tree_util.tree_leaves(g_e)
        flat_l = jax.tree_util.tree_leaves(g_l)
        for a, b in zip(flat_e, flat_l):
            assert bool(jnp.all(jnp.isfinite(b)))
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-6)

    def test_dense_pairs_never_overflow_beyond_budget_scene(self):
        """The overflow scene from TestKBudgets: global K=24 truncates on
        the klist path; with the same tiny budgets plus the dense gate the
        wide pairs go dense and the truncation disappears."""
        sample = self._grid_sample()
        cfg = model_cfg(os.path.join(CONFIG_DIR, "WaterRamps.yml"))
        cfg.pop("neighbor_k_gaps", None)
        cfg["neighbor_k"] = 24
        cfg["dense_pair_min_k"] = 0
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), sample, training=False)
        _, _, aux = model.apply(params, sample, training=False)
        assert int(aux["pair_overflow"]) > 0

        cfg["neighbor_k_gaps"] = [96, 256]
        cfg["dense_pair_min_k"] = 96
        model2 = build_model(cfg)
        _, _, aux2 = model2.apply(params, sample, training=False)
        assert int(aux2["pair_overflow"]) <= 0

    def test_grads_finite_with_far_masked_rows(self):
        """Regression: padded rows drift to huge coordinates through
        integration of garbage rows (observed ~1e8 in wide-column BPTT).
        The forward is masked, but unclamped qnorm/rel through the dense
        pair's window/mapping VJPs overflowed fp32 and the where-VJP
        turned 0 x inf into NaN grads (SearchCache.get_dense sanitizes
        invalid pairs now)."""
        sample = dict(self._grid_sample())
        pos = np.asarray(sample["pos"]).copy()
        pos[200:] = 1e8  # masked rows far out (fluid_mask < 256 is all
        # valid in _grid_sample, so shrink the mask too)
        sample["pos"] = jnp.asarray(pos)
        sample["fluid_mask"] = jnp.asarray(np.arange(256) < 200)
        cfg = model_cfg(os.path.join(CONFIG_DIR, "WaterRamps.yml"))
        cfg["dense_pair_min_k"] = 96
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), sample, training=False)

        def loss(params):
            p, v, _ = model.apply(params, sample, training=True)
            m = sample["fluid_mask"][:, None]
            return jnp.sum(jnp.where(m, p, 0.0) ** 2)

        g = jax.grad(loss)(params)
        assert all(bool(jnp.all(jnp.isfinite(l)))
                   for l in jax.tree_util.tree_leaves(g))


class TestTransposeSearchReuse:
    """``transpose_search_reuse``: the (j, i) trunk pair search is derived
    from the computed (i, j) transpose by inversion — exact while no pair
    overflows its K (the L2 ball is symmetric)."""

    def test_forward_matches_direct_search(self):
        sample = make_sample(n=96, n_valid=80, b=24, b_valid=16, dim=2,
                             seed=11)
        cfg = model_cfg(os.path.join(CONFIG_DIR, "WaterRamps.yml"))
        cfg["transpose_search_reuse"] = False
        ref = build_model(cfg)
        params = ref.init(jax.random.PRNGKey(5), sample, training=False)
        ref_pos, ref_vel, ref_aux = ref.apply(params, sample, training=False)
        assert int(ref_aux["pair_overflow"]) <= 0

        cfg["transpose_search_reuse"] = True
        opt = build_model(cfg)
        pos, vel, aux = opt.apply(params, sample, training=False)
        assert int(aux["pair_overflow"]) <= 0
        np.testing.assert_allclose(np.asarray(pos), np.asarray(ref_pos),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(vel), np.asarray(ref_vel),
                                   rtol=0, atol=2e-3)

    def test_inverted_list_equals_direct(self):
        from dmcf_tpu.ops.neighbors import (fixed_radius_search,
                                            invert_neighbors_list)
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.uniform(-1, 1, (60, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (40, 3)).astype(np.float32))
        am = jnp.asarray(np.arange(60) < 50)
        bm = jnp.asarray(np.arange(40) < 35)
        fwd = fixed_radius_search(a, b, 0.5, 64, points_mask=am,
                                  queries_mask=bm)
        assert int(jnp.max(fwd.count)) <= 64  # exactness precondition
        inv = invert_neighbors_list(fwd, 60, 64)
        direct = fixed_radius_search(b, a, 0.5, 64, points_mask=bm,
                                     queries_mask=am)
        # same neighbor sets per row (order may differ)
        for r in range(60):
            s1 = set(np.asarray(inv.idx[r])[np.asarray(inv.mask[r])])
            s2 = set(np.asarray(direct.idx[r])[np.asarray(direct.mask[r])])
            assert s1 == s2, r
        np.testing.assert_array_equal(np.asarray(inv.count),
                                      np.asarray(direct.count))
        # displacement sign flip: points[idx] - queries of the inverse
        d = np.asarray(b)[np.asarray(inv.idx)] - np.asarray(a)[:, None, :]
        np.testing.assert_allclose(
            np.where(np.asarray(inv.mask)[..., None], d, 0.0),
            np.asarray(inv.disp), atol=1e-6)


class TestKChunkedConv:
    def test_chunked_equals_unchunked(self):
        """conv_k_chunk: the conv is linear in the neighbor axis, so
        K-chunked evaluation (bounded transients) is the same function."""
        sample = make_sample(n=96, n_valid=80, b=24, b_valid=16, dim=3,
                             seed=13)
        cfg = model_cfg(os.path.join(CONFIG_DIR, "Liquid3d.yml"))
        cfg["neighbor_k_pairs"] = [[32, 48, 96], [32, 32, 64], [32, 32, 32]]
        ref = build_model(cfg)
        params = ref.init(jax.random.PRNGKey(3), sample, training=False)
        ref_pos, ref_vel, _ = ref.apply(params, sample, training=False)

        cfg["conv_k_chunk"] = 24          # chunks every pair list wider
        cfg["tap_cache_max_elems"] = 0    # force the inline (chunkable) path
        chk = build_model(cfg)
        pos, vel, _ = chk.apply(params, sample, training=False)
        np.testing.assert_allclose(np.asarray(pos), np.asarray(ref_pos),
                                   rtol=0, atol=2e-6)
