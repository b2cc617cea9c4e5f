"""Halo-exchange spatial decomposition (parallel/halo.py): exactness of
the slab-decomposed search/conv against the single-device ops, and the
per-device memory scaling that motivates it (VERDICT r2 item 4: peak
per-device working set must scale ~1/D, which the GSPMD annotation path
cannot deliver because the partitioner replicates the sort-based search).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmcf_tpu.ops.cconv import continuous_conv
from dmcf_tpu.ops.grid_search import grid_fixed_radius_search
from dmcf_tpu.parallel.halo import (make_halo_search_conv, min_slab_width,
                                    shard_parts, slab_partition)
from dmcf_tpu.parallel.spatial import make_spatial_mesh

RADIUS = 0.1
K = 32


def _cloud(n=1024, pad=1152, seed=0):
    rng = np.random.RandomState(seed)
    pos = np.zeros((pad, 3), np.float32)
    # elongated along x so 8 slabs stay wider than the halo
    pos[:n, 0] = rng.uniform(-4.0, 4.0, n)
    pos[:n, 1:] = rng.uniform(-0.3, 0.3, (n, 2))
    pos[n:] = 1e6 + np.arange(pad - n)[:, None] * 5.0
    mask = np.arange(pad) < n
    feats = np.zeros((pad, 4), np.float32)
    feats[:n] = rng.normal(size=(n, 4)).astype(np.float32)
    return pos, mask, feats


@pytest.fixture(scope="module")
def mesh():
    return make_spatial_mesh(jax.devices())


class TestSlabPartition:
    def test_partition_covers_and_bounds_are_wide(self):
        pos, mask, feats = _cloud()
        parts = slab_partition(pos, mask, 8, payload=feats)
        # every valid input point appears exactly once across shards
        got = np.sort(parts["src"][parts["mask"]])
        np.testing.assert_array_equal(got, np.nonzero(mask)[0])
        # slabs must be wider than the halo for correctness
        assert min_slab_width(parts["bounds"]) > RADIUS
        # payload rides along
        np.testing.assert_array_equal(
            parts["payload"][parts["mask"]],
            np.asarray(feats)[parts["src"][parts["mask"]]])


class TestHaloSearch:
    def test_counts_match_single_device(self, mesh):
        pos, mask, feats = _cloud()
        nl_ref = grid_fixed_radius_search(
            jnp.asarray(pos), jnp.asarray(pos), RADIUS, K,
            points_mask=jnp.asarray(mask), queries_mask=jnp.asarray(mask))

        parts = slab_partition(pos, mask, 8, payload=feats)
        parts = shard_parts(parts, mesh)
        run = make_halo_search_conv(mesh, radius=RADIUS, k=K, halo_cap=256)
        out, over = jax.jit(run)(parts)
        assert int(over) == 0
        counts = np.zeros((pos.shape[0],), np.float32)
        src = np.asarray(parts["src"]).reshape(-1)
        m = np.asarray(parts["mask"]).reshape(-1)
        counts[src[m]] = np.asarray(out).reshape(-1)[m]
        np.testing.assert_array_equal(counts[mask],
                                      np.asarray(nl_ref.count)[mask])

    def test_conv_matches_single_device(self, mesh):
        pos, mask, feats = _cloud()
        rng = np.random.RandomState(1)
        kernel = rng.normal(scale=0.1,
                            size=(4, 4, 4, 4, 8)).astype(np.float32)
        from dmcf_tpu.ops.windows import get_window_func
        win = get_window_func("poly6")

        nl_ref = grid_fixed_radius_search(
            jnp.asarray(pos), jnp.asarray(pos), RADIUS, K,
            points_mask=jnp.asarray(mask), queries_mask=jnp.asarray(mask))
        ref = continuous_conv(
            jnp.asarray(kernel), jnp.asarray(pos), jnp.asarray(pos),
            jnp.asarray(feats), nl_ref, 2.0 * RADIUS, window_fn=win,
            precision="highest")
        ref = np.asarray(jnp.where(jnp.asarray(mask)[:, None], ref, 0.0))

        parts = slab_partition(pos, mask, 8, payload=feats)
        parts = shard_parts(parts, mesh)
        run = make_halo_search_conv(mesh, radius=RADIUS, k=K, halo_cap=256,
                                    window_fn=win, precision="highest")
        out, over = jax.jit(run)(parts, jnp.asarray(kernel))
        assert int(over) == 0
        got = np.zeros_like(ref)
        src = np.asarray(parts["src"]).reshape(-1)
        m = np.asarray(parts["mask"]).reshape(-1)
        got[src[m]] = np.asarray(out).reshape(len(m) // 8 * 8, -1)[m]
        np.testing.assert_allclose(got[mask], ref[mask], atol=2e-5)

    def test_halo_overflow_reported(self, mesh):
        pos, mask, feats = _cloud()
        parts = slab_partition(pos, mask, 8, payload=feats)
        parts = shard_parts(parts, mesh)
        # halo_cap far below the true boundary-zone population
        run = make_halo_search_conv(mesh, radius=1.5, k=K, halo_cap=2)
        _, over = jax.jit(run)(parts)
        assert int(over) > 0


class TestHaloMemoryScaling:
    def test_per_device_temp_memory_scales(self, mesh):
        """The distributed-memory claim: per-device temp HBM of the halo
        step must be well under 1/4 of the single-device step at 8 shards
        (vs the GSPMD path's measured 1/1.58)."""
        pos, mask, feats = _cloud(n=8192, pad=8192, seed=2)

        single = jax.jit(lambda p, m: grid_fixed_radius_search(
            p, p, RADIUS, K, points_mask=m, queries_mask=m).count)
        c1 = single.lower(jnp.asarray(pos),
                          jnp.asarray(mask)).compile()
        temp_1 = c1.memory_analysis().temp_size_in_bytes

        parts = slab_partition(pos, mask, 8, payload=feats)
        parts = shard_parts(parts, mesh)
        run = make_halo_search_conv(mesh, radius=RADIUS, k=K, halo_cap=512)
        cm = jax.jit(run).lower(parts).compile()
        temp_8 = cm.memory_analysis().temp_size_in_bytes

        assert temp_8 < 0.25 * temp_1, (temp_8, temp_1)

    def test_canyon_scale_memory_and_exactness(self, mesh):
        """VERDICT r2 item 4 'Done' bar at canyon scale (the reference's
        185k-boundary demo regime, run_sample.py:121-179), on the
        8-device mesh, asserted via memory_analysis():

        - per-device DATA (arguments + outputs, the part that grows with
          the scene) scales ~1/D, and
        - per-device TEMP is bounded by a constant independent of N (the
          grid search processes queries in fixed 8192-row chunks, so its
          probe buffers don't grow with the scene),

        so per-device peak = const + data/D: a scene several times one
        chip's HBM runs once D is large enough — the scenario the GSPMD
        annotation path could not deliver (temp relief capped at 1.58x).
        Search outputs must match the single-device op exactly."""
        n = 184320  # canyon boundary scale, lane-aligned
        rng = np.random.RandomState(3)
        pos = np.zeros((n, 3), np.float32)
        # canyon-like: long in x, shallow in y/z
        pos[:, 0] = rng.uniform(-20.0, 20.0, n)
        pos[:, 1] = rng.uniform(-1.0, 1.0, n)
        pos[:, 2] = rng.uniform(-2.0, 2.0, n)
        mask = np.ones(n, bool)
        feats = rng.normal(size=(n, 4)).astype(np.float32)

        single = jax.jit(lambda p, m: grid_fixed_radius_search(
            p, p, RADIUS, K, points_mask=m, queries_mask=m).count)
        c1 = single.lower(jnp.asarray(pos), jnp.asarray(mask)).compile()
        ma1 = c1.memory_analysis()

        parts = slab_partition(pos, mask, 8, payload=feats)
        assert min_slab_width(parts["bounds"]) > RADIUS
        parts = shard_parts(parts, mesh)
        run = make_halo_search_conv(mesh, radius=RADIUS, k=K,
                                    halo_cap=4096)
        comp = jax.jit(run).lower(parts).compile()
        ma8 = comp.memory_analysis()
        # memory_analysis reports PER-DEVICE sizes for the SPMD program.
        # Data (args+outputs) must scale ~1/D; allow 2/D of slack for the
        # received halos and lane padding.
        data_1 = ma1.argument_size_in_bytes + ma1.output_size_in_bytes
        data_8 = ma8.argument_size_in_bytes + ma8.output_size_in_bytes
        assert data_8 < 2.0 * data_1 / 8, (data_8, data_1)
        # Temp must stay chunk-bound (constant in N): no worse than the
        # single-device program's temp on the same problem.
        assert ma8.temp_size_in_bytes <= 1.1 * ma1.temp_size_in_bytes, (
            ma8.temp_size_in_bytes, ma1.temp_size_in_bytes)

        counts, over = comp(parts)
        assert int(over) == 0
        ref_counts = np.asarray(single(jnp.asarray(pos),
                                       jnp.asarray(mask)))
        got = np.zeros((n,), np.float32)
        src = np.asarray(parts["src"]).reshape(-1)
        m = np.asarray(parts["mask"]).reshape(-1)
        got[src[m]] = np.asarray(counts).reshape(-1)[m]
        np.testing.assert_array_equal(got, ref_counts.astype(np.float32))
