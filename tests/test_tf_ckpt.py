"""TF-checkpoint -> flax conversion of the shipped Liquid3d reference model.

The only complete pretrained bundle in the reference mount is
checkpoints/Liquid3d (README.md:39-49; the other two lack their .data
blobs).  Converting it end-to-end — every variable consumed, every flax
param assigned, strict shape match — exercises the full naming/layout
contract between the rebuild and the reference (utils/convolutions.py
kernel shapes, models/pbf_model.py:197-224 conv naming).
"""

import os

import numpy as np
import pytest

REF_CKPT = "/root/reference/checkpoints/Liquid3d/ckpt"

tf = pytest.importorskip("tensorflow")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CKPT + ".index"),
    reason="reference Liquid3d checkpoint not mounted")


@pytest.fixture(scope="module")
def liquid3d_model():
    import yaml

    from dmcf_tpu.models import build_model
    cfg = yaml.safe_load(
        open(os.path.join(os.path.dirname(__file__), "..",
                          "configs", "Liquid3d.yml")))["model"]
    return build_model(cfg)


def _sample(n=64, b=32):
    rng = np.random.RandomState(0)
    return {
        "pos": rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32),
        "vel": np.zeros((n, 3), np.float32),
        "grav": np.tile(np.array([0, -9.81, 0], np.float32), (n, 1)),
        "box": rng.uniform(-0.6, 0.6, (b, 3)).astype(np.float32),
        "box_normals": np.tile(np.array([0, 1, 0], np.float32), (b, 1)),
        "fluid_mask": np.ones(n, bool),
        "box_mask": np.ones(b, bool),
    }


def test_convert_liquid3d_full_coverage(liquid3d_model):
    import jax

    from dmcf_tpu.utils.tf_ckpt import load_tf_reference_checkpoint

    model = liquid3d_model
    sample = {k: np.asarray(v) for k, v in _sample().items()}
    template = jax.jit(lambda k, s: model.init(k, s, training=False))(
        jax.random.PRNGKey(0), sample)
    template = jax.tree.map(np.asarray, template)

    params = load_tf_reference_checkpoint(
        REF_CKPT, template, model.layer_channels,
        use_pre_adv=model.use_pre_adv, strict=True)

    # spot-check a couple of known variables land in the right leaves
    rd = tf.train.load_checkpoint(REF_CKPT)
    vv = "/.ATTRIBUTES/VARIABLE_VALUE"
    np.testing.assert_array_equal(
        params["params"]["fluid_obs"]["kernel"],
        rd.get_tensor("model/fluid_convs/kernel" + vv))
    np.testing.assert_array_equal(
        params["params"]["sym_conv0"]["kernel"],
        rd.get_tensor("model/sym_convs/0/kernel" + vv))
    # trunk conv 100_0 is _all_convs index 2 (after fluid/obs)
    np.testing.assert_array_equal(
        params["params"]["conv100_0"]["kernel"],
        rd.get_tensor("model/_all_convs/2/1/kernel" + vv))
    # dense tree: our Dense wraps nn.Dense as Dense_0
    np.testing.assert_array_equal(
        params["params"]["dense100_0"]["Dense_0"]["kernel"],
        rd.get_tensor("model/denses/0/0/0/0/kernel" + vv))


def test_converted_step_is_finite_and_conserving(liquid3d_model):
    """One simulation step with the *trained* weights: finite outputs and
    (SymNet) fluid-fluid momentum exchange consistent with the ASCC
    guarantee — the strongest single-step semantics check available
    without the reference runtime."""
    import jax
    import jax.numpy as jnp

    from dmcf_tpu.utils.tf_ckpt import load_tf_reference_checkpoint

    model = liquid3d_model
    sample = {k: np.asarray(v) for k, v in _sample(n=128, b=2).items()}
    # isolated fluid blob, boundary far away: total momentum change must be
    # exactly the gravity impulse
    sample["pos"] = np.random.RandomState(1).uniform(
        -0.2, 0.2, (128, 3)).astype(np.float32)
    sample["box"][:] = 100.0

    template = jax.jit(lambda k, s: model.init(k, s, training=False))(
        jax.random.PRNGKey(0), sample)
    params = load_tf_reference_checkpoint(
        REF_CKPT, jax.tree.map(np.asarray, template),
        model.layer_channels, use_pre_adv=model.use_pre_adv)
    params = jax.tree.map(jnp.asarray, params)

    pos, vel, aux = jax.jit(
        lambda p, s: model.apply(p, s, training=False))(params, sample)
    assert bool(jnp.all(jnp.isfinite(pos)))
    assert bool(jnp.all(jnp.isfinite(vel)))
    # correction must be non-trivial (weights actually used)
    assert float(jnp.max(jnp.abs(aux["pos_correction"]))) > 0.0

    dv = vel - (sample["vel"] + model.timestep *
                np.array([0, model.grav, 0], np.float32))
    residual = jnp.sum(dv, axis=0)
    scale = jnp.sum(jnp.abs(vel))
    assert float(jnp.max(jnp.abs(residual))) < 1e-4 * max(float(scale), 1.0)
