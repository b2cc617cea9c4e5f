"""Neighbor-budget overflow surfacing.

With fixed-K padded neighbor lists, a dense clump exceeding K silently
drops neighbors — a silent-physics-bug class the pipeline must surface
(SURVEY §7 'hard parts'; the reference's ragged CSR lists cannot overflow).
"""

import numpy as np
import pytest


def _clump_sample(n=64, spread=0.001):
    rng = np.random.RandomState(0)
    return {
        "pos": (rng.uniform(-spread, spread, (n, 3))).astype(np.float32),
        "vel": np.zeros((n, 3), np.float32),
        "grav": np.tile(np.array([0, -9.81, 0], np.float32), (n, 1)),
        "box": np.full((8, 3), 50.0, np.float32),
        "box_normals": np.tile(np.array([0, 1, 0], np.float32), (8, 1)),
        "fluid_mask": np.ones(n, bool),
        "box_mask": np.ones(8, bool),
    }


def test_aux_reports_true_count_beyond_k():
    """aux['neighbor_overflow'] is the max TRUE neighbor count — with all 64
    particles coincident-ish and K=8 it must report ~64, not clamp at 8."""
    import jax

    from dmcf_tpu.models.hrnet import HRNet

    model = HRNet(particle_radii=(0.05,), strides=(1,),
                  layer_channels=(((4,),), ((3,),)), kernel_size=(2, 2, 2),
                  neighbor_k=8, window="poly6")
    sample = _clump_sample()
    params = jax.jit(lambda k, s: model.init(k, s, training=False))(
        jax.random.PRNGKey(0), sample)
    _, _, aux = jax.jit(lambda p, s: model.apply(p, s, training=False))(
        params, sample)
    assert int(aux["neighbor_overflow"]) > 8
    assert float(aux["avg_neighbors"]) > 8


def test_check_neighbor_overflow_warn_and_strict(caplog):
    """The pipeline check warns by default and raises with
    strict_overflow: true."""
    from dmcf_tpu.pipelines.simulator import Simulator

    class Stub:
        model = type("M", (), {"neighbor_k": 8})()
        cfg = {"strict_overflow": False}

    stub = Stub()
    import logging
    with caplog.at_level(logging.WARNING,
                         logger="dmcf_tpu.pipelines.simulator"):
        Simulator._check_neighbor_overflow(stub, 17, "unit test")
    assert any("neighbor overflow" in r.getMessage()
               for r in caplog.records)

    stub.cfg = {"strict_overflow": True}
    with pytest.raises(RuntimeError, match="neighbor overflow"):
        Simulator._check_neighbor_overflow(stub, 17, "unit test")

    # within budget: no warning, no raise
    caplog.clear()
    Simulator._check_neighbor_overflow(stub, 8, "unit test")
    assert not caplog.records


def test_grid_search_cell_overflow_reported():
    """grid_fixed_radius_search returns per-query dropped-candidate counts
    when a cell holds more points than cell_cap."""
    import jax.numpy as jnp

    from dmcf_tpu.ops.grid_search import grid_fixed_radius_search

    pts = np.zeros((32, 3), np.float32)  # all in one cell
    pts += np.random.RandomState(0).uniform(
        0, 0.001, (32, 3)).astype(np.float32)
    nl = grid_fixed_radius_search(jnp.asarray(pts), jnp.asarray(pts[:4]),
                                  0.1, 32, cell_cap=8)
    assert nl.cell_overflow is not None
    assert int(jnp.max(nl.cell_overflow)) > 0
