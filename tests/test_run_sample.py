"""End-to-end CLI test of run_sample.py (reference run_sample.py:121-218):
scene load -> fixed-shape inflow -> chunked rollout -> hdf5 dump, on CPU
with a tiny synthetic scene.  Also locks in the rollout overflow report."""

import os
import subprocess
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _make_scene(path):
    from dmcf_tpu.data import write_msgpack_zst
    rng = np.random.RandomState(0)
    n = 64
    side = 8
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    pos = np.stack([xs.reshape(-1) * 0.05, 0.3 + ys.reshape(-1) * 0.05,
                    np.zeros(n)], -1).astype(np.float32)
    pos[:, 2] = 0.5
    m = 24
    line = np.arange(m) * 0.05
    box = np.stack([line, np.zeros(m), np.full(m, 0.5)], -1)
    box = np.concatenate([box, np.stack(
        [line, np.zeros(m) + 0.05, np.full(m, 0.45)], -1)]).astype(np.float32)
    nrm = np.zeros_like(box)
    nrm[:, 1] = 1.0
    frames = [{
        "frame_id": 0, "scene_id": "t0",
        "pos": pos, "vel": np.zeros_like(pos),
        "grav": np.tile(np.array([0, -9.81, 0], np.float32), (n, 1)),
        "box": box, "box_normals": nrm,
    }]
    write_msgpack_zst(path, frames)


def test_run_sample_cli(tmp_path):
    scene = str(tmp_path / "scene.msgpack.zst")
    _make_scene(scene)
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "run_sample.py", "-c", "configs/Liquid3d.yml",
         "--device", "cpu", "--data_path", scene, "--timesteps", "5",
         "--inflow", "4", "--inflow_every", "2", "--chunk", "2",
         "--vel", "0", "0", "0", "--output_dir", out],
        cwd=ROOT, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "max true neighbor count over rollout" in r.stdout
    h5 = os.path.join(out, "example", "0000", "0000.hdf5")
    assert os.path.exists(h5)
    import h5py
    with h5py.File(h5, "r") as f:
        grp = f[list(f.keys())[0]]
        pred = np.asarray(grp["pred"])
    assert pred.shape[0] == 5
    # inflow events at t=1 and t=3 add 64 particles each
    active = np.abs(pred[:, :, 0]) < 500.0
    counts = active.sum(1)
    assert counts[0] == 64 and counts[-1] == 192, counts
    assert np.isfinite(pred[active]).all()


def test_run_sample_spatial_halo(tmp_path):
    """--spatial halo: slab-decomposed rollout over the full device set
    (VERDICT r4 item 5 — the halo path must be reachable from the user
    surface).  Runs on a virtual 8-device CPU mesh."""
    scene = str(tmp_path / "scene.msgpack.zst")
    _make_scene(scene)
    out = str(tmp_path / "out")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "run_sample.py", "-c", "configs/Liquid3d.yml",
         "--device", "cpu", "--data_path", scene, "--timesteps", "5",
         "--vel", "0", "0", "0", "--spatial", "halo", "--chunk", "2",
         "--output_dir", out],
        cwd=ROOT, capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "halo report:" in r.stdout
    assert "HALO OVERFLOW" not in r.stdout
    h5 = os.path.join(out, "example", "0000", "0000.hdf5")
    assert os.path.exists(h5)
    import h5py
    with h5py.File(h5, "r") as f:
        grp = f[list(f.keys())[0]]
        pred = np.asarray(grp["pred"])
    assert pred.shape[0] == 5
    active = np.abs(pred[:, :, 0]) < 500.0
    assert active[0].sum() == 64 and active[-1].sum() == 64
    assert np.isfinite(pred[active]).all()
