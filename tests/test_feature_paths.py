"""Forward-path coverage for the optional model branches the shipped
configs leave off: density/pressure features, density normalization,
pre-advection branch, equivariant output, vel_corr iterations, use_bnds
off, circular kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmcf_tpu.models import build_model

from test_models import make_sample

BASE = {
    "name": "HRNet",
    "layer_channels": [[[8]], [[8], [4]], [[8]], [[2]]],
    "kernel_size": [1, 4, 4],
    "window": "poly6",
    "window_dens": "poly6",
    "strides": [1, 2],
    "particle_radii": [0.05, 0.1],
    "voxel_size": [0.025, 0.025, 0.0],
    "timestep": 0.0025,
    "grav": -9.81,
    "out_scale": [1e-4, 1e-4, 0.0],
    "add_merge": True,
    "neighbor_k": 24,
}


def run_forward(cfg_updates, vel_corr=False, seed=0):
    cfg = dict(BASE)
    cfg.update(cfg_updates)
    model = build_model(cfg)
    sample = make_sample(seed=seed)
    params = model.init(jax.random.PRNGKey(0), sample, training=False)
    kwargs = {}
    if vel_corr:
        kwargs["vel_corr"] = sample["vel"] * 0.5
    pos, vel, aux = model.apply(params, sample, training=False, **kwargs)
    fm = np.asarray(sample["fluid_mask"])
    assert np.all(np.isfinite(np.asarray(pos)[fm]))
    assert np.all(np.isfinite(np.asarray(vel)[fm]))
    return pos, vel, aux


class TestOptionalBranches:
    def test_dens_and_pres_feats(self):
        run_forward({"dens_feats": True, "pres_feats": True,
                     "rest_dens": 2.0, "stiffness": 10.0})

    def test_dens_norm_pyramid(self):
        run_forward({"dens_norm": True,
                     "dens_radius": [0.05, 0.1]})

    def test_pre_advection_branch(self):
        run_forward({"use_pre_adv": True})

    def test_equivariant_output(self):
        run_forward({"equivar": True})

    def test_use_bnds_off(self):
        run_forward({"use_bnds": False})

    def test_circular_kernel(self):
        run_forward({"circular": True,
                     "layer_channels": [[[8]], [[8]], [[3]]]})

    def test_vel_corr_iteration_path(self):
        """The training ``iterations`` loop feeds the corrected velocity
        back as vel_corr with stopped gradients
        (reference models/pbf_model.py:314-316)."""
        run_forward({}, vel_corr=True)

    def test_ignore_query_points(self):
        run_forward({"ignore_query_points": True})

    def test_grav_eqvar_transform(self):
        pos, vel, aux = run_forward(
            {"transformation": {"grav_eqvar": [0, -1, 0]}})

    def test_translate_scale_transform(self):
        run_forward({"transformation": {"translate": [0.1, 0.0, 0.0],
                                        "scale": [1.0, 1.0, 0.0]}})
