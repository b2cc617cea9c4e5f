"""Result writers (reference dataset_reader_physics.py:520-526)."""

from __future__ import annotations

import os

import h5py


def write_results(path, name, data):
    """Write rollout arrays to hdf5: one group per model, one dataset per
    series (pred/gt/bnd) with type/dim attributes."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        grp = f.create_group(name)
        for d, props in data:
            dset = grp.create_dataset(props["name"], data=d)
            dset.attrs["type"] = props.get("type", "DENSITY")
            dset.attrs["dim"] = d.shape
