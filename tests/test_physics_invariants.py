"""End-to-end physics invariants: momentum conservation through full
SymNet rollouts (the paper's core claim), curriculum schedules."""

import jax
import jax.numpy as jnp
import numpy as np

from dmcf_tpu.data.generators import gen_momentum_data
from dmcf_tpu.models import build_model
from dmcf_tpu.ops import masked_positions
from dmcf_tpu.pipelines.simulator import (advance_curriculum,
                                          compute_time_weights)


class TestRolloutMomentum:
    def test_symnet_rollout_conserves_momentum(self):
        """Over a boundary-free rollout, each step's total velocity change
        must equal the gravity impulse exactly: the ASCC corrections sum to
        zero, so sum_i (v_{t+1} - v_t - g*dt) ~ 0 at fp32 precision
        (paper Sec. 4; 'momentum' validation protocol)."""
        scenes = gen_momentum_data(1, 2, res=100, dim=2, radius=10,
                                   gravity=-10.0)
        f0 = scenes[0][0]
        n = f0["pos"].shape[0]
        n_pad = int(-(-n // 64) * 64)

        cfg = {
            "name": "SymNet",
            "layer_channels": [[[8]], [[16], [8]], [[16]], [[2]]],
            "kernel_size": [1, 4, 4],
            "sym_kernel_size": [1, 4, 4],
            "window": "poly6", "window_sym": "peak",
            "strides": [1, 2], "particle_radii": [0.02, 0.04],
            "voxel_size": [0.01, 0.01, 0.0],
            "timestep": 0.0025, "grav": -10.0,
            "out_scale": [1e-4, 1e-4, 0.0],
            "sym_axis": 1, "add_merge": True, "neighbor_k": 48,
        }
        model = build_model(cfg)

        fm = np.arange(n_pad) < n
        pos = np.zeros((n_pad, 3), np.float32)
        pos[:n] = f0["pos"]
        vel = np.zeros((n_pad, 3), np.float32)
        vel[:n] = f0["vel"]
        grav = np.zeros((n_pad, 3), np.float32)
        grav[:, 1] = -10.0
        sample = {
            "pos": jnp.asarray(masked_positions(jnp.asarray(pos),
                                                jnp.asarray(fm))),
            "vel": jnp.asarray(vel),
            "grav": jnp.asarray(grav),
            "box": jnp.asarray(np.full((64, 3), 1e6, np.float32)),
            "box_normals": jnp.zeros((64, 3)),
            "fluid_mask": jnp.asarray(fm),
            "box_mask": jnp.zeros(64, bool),
        }
        params = jax.jit(lambda k, s: model.init(k, s, training=False))(
            jax.random.PRNGKey(3), sample)

        @jax.jit
        def rollout(params, s):
            def body(carry, _):
                pos, vel = carry
                ss = dict(s)
                ss["pos"], ss["vel"] = pos, vel
                p, v, _ = model.apply(params, ss, training=False)
                return (p, v), (p, v)
            return jax.lax.scan(body, (s["pos"], s["vel"]), None, length=10)

        (_, _), (ps, vs) = rollout(params, sample)
        vs = np.asarray(vs)[:, fm]
        v_prev = np.concatenate([vel[None, fm], vs[:-1]], 0)
        dt = 0.0025
        g_impulse = np.array([0.0, -10.0 * dt, 0.0])
        # per-step total momentum residual after removing gravity impulse
        resid = (vs - v_prev - g_impulse).sum(axis=1)
        scale = np.abs(vs - v_prev).sum() + 1e-9
        assert np.all(np.abs(resid) / scale < 1e-4), resid

    def test_momentum_scene_schema(self):
        scenes = gen_momentum_data(2, 5, dim=2)
        f = scenes[0][0]
        assert f["box"].shape == (1, 3)
        total_v = f["vel"].sum(0)
        np.testing.assert_allclose(total_v, 0.0, atol=1e-4)  # symmetric


class TestCurriculum:
    WINDOWS = [3, 5, 10]
    BNDS = [100, 200]

    def test_advance_boundaries(self):
        state = (0, 0, 0)
        state, rebuild = advance_curriculum(
            50, state, self.WINDOWS, self.BNDS, [0, 5], [150], [0], [])
        assert state == (0, 0, 0) and not rebuild
        state, rebuild = advance_curriculum(
            100, state, self.WINDOWS, self.BNDS, [0, 5], [150], [0], [])
        assert state == (1, 0, 0) and rebuild
        state, rebuild = advance_curriculum(
            250, state, self.WINDOWS, self.BNDS, [0, 5], [150], [0], [])
        assert state == (2, 1, 0) and rebuild

    def test_time_weight_blend(self):
        # right after the first boundary the new trailing steps fade in
        w = compute_time_weights(100, 1, self.WINDOWS, self.BNDS,
                                 time_blend=10)
        assert w.shape == (5,)
        assert w[:3].tolist() == [1.0, 1.0, 1.0]
        assert 0 < w[3] < 1.0 and w[4] <= w[3]
        # far past the blend horizon: all ones
        w = compute_time_weights(150, 1, self.WINDOWS, self.BNDS,
                                 time_blend=10)
        assert w.tolist() == [1.0] * 5
