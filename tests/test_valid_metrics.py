"""Validation metric suite: the batched device-side path (one lax.map
dispatch per sequence) must reproduce the per-timestep reference semantics
(reference pipelines/simulator.py:189-263), and run_* file logging must not
leak handlers (reference leaks one per call, simulator.py:124,176,296)."""

import logging
import types

import jax.numpy as jnp
import numpy as np

from tests.test_pipeline import _make_scenes


def _make_pipe(tmp_path, **over):
    from dmcf_tpu.data import Dataset
    from dmcf_tpu.models.hrnet import HRNet
    from dmcf_tpu.pipelines.simulator import Simulator

    ds = Dataset(_make_scenes(n_scenes=2, frames=8, n=6))
    group = types.SimpleNamespace(train=ds, valid=ds, test=ds, name="vm")
    model = HRNet(particle_radii=(0.1,), strides=(1,),
                  layer_channels=(((4,),), ((3,),)), kernel_size=(2, 2, 2),
                  neighbor_k=16, window="poly6", timestep=0.01)
    kwargs = dict(
        main_log_dir=str(tmp_path / "logs"),
        train_sum_dir=str(tmp_path / "train_log"),
        output_dir=str(tmp_path / "output"), seed=42,
        data_generator={"valid": {}})
    kwargs.update(over)
    return Simulator(model, dataset=group, name="Simulator", **kwargs)


def test_run_valid_full_suite_matches_reference_semantics(tmp_path):
    from dmcf_tpu.data import get_rollout
    from dmcf_tpu.pipelines.metrics import chamfer_distance, distance

    pipe = _make_pipe(tmp_path, valid_full_metrics=True)
    valid_data = get_rollout(pipe.dataset.valid)
    pipe.params = pipe._init_params_from_rollout(valid_data[0])

    loss = pipe.run_valid(epoch=0)
    full_keys = {"mse_val", "chamfer_val", "chamfer_val_2", "dens_val",
                 "max_dens_val", "emd", "vel_diff_val", "vel_diff_val_2",
                 "mse_single_val", "loss"}
    assert set(loss.keys()) == full_keys
    assert all(np.isfinite(v) for v in loss.values())

    # cross-check the batched device metrics against explicit per-timestep
    # evaluation (the semantics the reference implements host-side)
    data = valid_data[0]
    horizon = data["pos"].shape[0]
    ps, vs = pipe.run_rollout([data], horizon)[0]
    dev = pipe._seq_device_metrics(data, ps, full=True)

    from dmcf_tpu.ops.emd import emd_loss
    box = data["box"]
    for t in (1, horizon - 1):
        # single-step prediction from the GT state at t-1
        state = {
            "pos": data["pos"][t - 1:t], "vel": data["vel"][t - 1:t],
            "grav": data["grav"][t - 1:t], "box": box,
            "box_normals": data["box_normals"],
        }
        from dmcf_tpu.data import pad_rollout_state
        padded = pad_rollout_state(state, bucket=64)
        s = {k: jnp.asarray(padded[k][0] if k in ("pos", "vel", "grav")
                            else padded[k])
             for k in ("pos", "vel", "grav", "box", "box_normals",
                       "fluid_mask", "box_mask")}
        pos1, _ = pipe._get_step_fn()(pipe.params, s)
        single = np.asarray(pos1)[:padded["n_fluid"]]
        want = float(np.mean(distance(data["pos"][t], single)))
        np.testing.assert_allclose(dev["mse_single_val"][t - 1], want,
                                   rtol=2e-5, atol=1e-7)

        # EMD on the clipped prediction, unpadded arrays
        pred = np.clip(ps[t], box.min(0), box.max(0))
        want_emd = float(emd_loss(jnp.asarray(data["pos"][t][None]),
                                  jnp.asarray(pred[None]))[0])
        np.testing.assert_allclose(dev["emd"][t - 1], want_emd,
                                   rtol=1e-4, atol=1e-7)

        want_ch = float(np.mean(chamfer_distance(data["pos"][t], pred)))
        assert np.isfinite(want_ch)


def test_run_valid_subset_without_full_metrics(tmp_path):
    from dmcf_tpu.data import get_rollout

    pipe = _make_pipe(tmp_path, split="train")
    valid_data = get_rollout(pipe.dataset.valid)
    pipe.params = pipe._init_params_from_rollout(valid_data[0])
    loss = pipe.run_valid(epoch=0)
    assert set(loss.keys()) == {"mse_val", "chamfer_val", "mse_single_val",
                                "loss"}


def test_file_log_handler_hygiene(tmp_path):
    from dmcf_tpu.data import get_rollout

    pipe = _make_pipe(tmp_path)
    valid_data = get_rollout(pipe.dataset.valid)
    pipe.params = pipe._init_params_from_rollout(valid_data[0])

    pkg = logging.getLogger("dmcf_tpu")
    before = list(pkg.handlers)
    for _ in range(3):
        pipe.run_valid(epoch=0)
    assert pkg.handlers == before
