"""Pallas fused-conv kernel vs the XLA formulation (interpret mode on
CPU; the TPU-compiled path is exercised by ad-hoc profiling)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dmcf_tpu.models.pbf import drop_coincident
from dmcf_tpu.ops import (build_symmetric_kernel, continuous_conv,
                          fixed_radius_search, get_window_func)
from dmcf_tpu.experimental.pallas_cconv import pallas_continuous_conv


def gathered_inputs(pts, feats, nl, radius, window):
    idx = np.asarray(nl.idx)
    mask = np.asarray(nl.mask)
    rel = (pts[idx] - pts[:, None, :]) / radius
    rel = np.where(mask[..., None], rel, 0.0).astype(np.float32)
    q = np.asarray(nl.dist) / radius**2
    a = (mask * np.asarray(window(jnp.asarray(q)))).astype(np.float32)
    fg = np.where(mask[..., None], feats[idx], 0.0).astype(np.float32)
    return jnp.asarray(rel), jnp.asarray(a), jnp.asarray(fg)


class TestPallasConv:
    @pytest.mark.parametrize("mapping", ["ball_to_cube_volume_preserving",
                                         "ball_to_cube_radial"])
    def test_matches_xla(self, mapping):
        rng = np.random.RandomState(0)
        Q, K, Cin, Cout = 256, 16, 8, 4
        pts = rng.uniform(-0.3, 0.3, (Q, 3)).astype(np.float32)
        pts[:, 2] = 0
        feats = rng.randn(Q, Cin).astype(np.float32)
        ext = 0.1
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                 ext / 2, k=K)
        win = get_window_func("poly6")
        kern = (rng.randn(1, 8, 8, Cin, Cout) * 0.1).astype(np.float32)
        ref = continuous_conv(jnp.asarray(kern), jnp.asarray(pts),
                              jnp.asarray(pts), jnp.asarray(feats), nl, ext,
                              window_fn=win, coordinate_mapping=mapping)
        rel, a, fg = gathered_inputs(pts, feats, nl, ext / 2, win)
        got = pallas_continuous_conv(jnp.asarray(kern), rel, a, fg,
                                     coordinate_mapping=mapping,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_symmetric_momentum(self):
        rng = np.random.RandomState(1)
        Q, K, Cin = 256, 16, 8
        pts = rng.uniform(-0.3, 0.3, (Q, 3)).astype(np.float32)
        feats = np.abs(rng.randn(Q, Cin)).astype(np.float32)
        ext = 0.15
        nl = fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts),
                                 ext / 2, k=K, ignore_query_point=True)
        nl = drop_coincident(nl, jnp.asarray(pts), jnp.asarray(pts))
        win = get_window_func("peak")
        kh = (rng.randn(2, 2, 2, Cin, 3) * 0.1).astype(np.float32)
        kern = build_symmetric_kernel(jnp.asarray(kh), 2)
        ref = continuous_conv(kern, jnp.asarray(pts), jnp.asarray(pts),
                              jnp.asarray(feats), nl, ext, window_fn=win,
                              symmetric=True,
                              query_features=jnp.asarray(feats))
        rel, a, fg = gathered_inputs(pts, feats, nl, ext / 2, win)
        got = pallas_continuous_conv(kern, rel, a, fg,
                                     query_feats=jnp.asarray(feats),
                                     symmetric=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
        total = np.abs(np.asarray(got).sum(0))
        scale = np.abs(np.asarray(got)).sum()
        assert np.all(total / scale < 1e-5)
