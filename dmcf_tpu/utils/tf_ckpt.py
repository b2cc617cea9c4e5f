"""TF-checkpoint -> flax parameter converter for reference DMCF models.

The reference ships pretrained ``tf.train.Checkpoint`` bundles
(README.md:39-49; saved via pipelines/base_pipeline.py:155-191 as
``tf.train.Checkpoint(step, optimizer, model)``).  This module maps those
variables into the rebuilt flax module tree so the pretrained models run on
TPU unchanged — and, transitively, acts as the strongest end-to-end
correctness check of the conv/scaffold rebuild: the conventions match
exactly (kernel layout ``[kz, ky, kx, Cin, Cout]``, symmetric half-kernel
stored with ``concat([-flip(K), K], sym_axis)`` expansion at call time,
keras/flax Dense ``[in, out]`` kernels), so converted weights must
reproduce the reference physics or the rebuild has a semantics bug.

Variable layout in the reference checkpoints (inspected from
checkpoints/Liquid3d/ckpt):

* ``model/fluid_convs/{kernel,bias}``   -> our ``fluid_obs``
  (the reference names the layer 'fluid_obs' too, models/pbf_model.py:134)
* ``model/obs_convs/{kernel,bias}``     -> our ``obs_conv``
* ``model/{fluid,obs}_dense/...``       -> our ``{fluid,obs}_dense``
* ``model/_all_convs/{n}/1/...``        -> trunk convs in *creation order*
  (pbf_model.py:223 appends every ``get_cconv`` result to ``_all_convs``;
  index 0/1 are fluid/obs convs which TF dedupes under their attribute
  names, so trunk convs start at n=2)
* ``model/denses/{i-1}/{j}/{k}/{l}/...``-> our ``dense{i}{j}{k}_{l}``
* ``model/sym_convs/{n}/kernel``        -> our ``sym_conv{n}`` (half kernel)
* ``model/adv_convs/...``, ``model/adv_dense/...`` when ``use_pre_adv``

TensorFlow is imported lazily and only used to read the bundle on the host
(no open3d / GPU needed).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_VV = "/.ATTRIBUTES/VARIABLE_VALUE"


def _reference_conv_order(layer_channels, use_pre_adv=False):
    """Replicate the reference's ``_all_convs`` append order
    (models/pbf_model.py:132-161 then hrnet.py:39-62): returns our flax
    module name per ``_all_convs`` index."""
    order = ["fluid_obs", "obs_conv"]
    if use_pre_adv:
        order += ["adv_conv0", "adv_conv1"]
    lc = layer_channels
    for i in range(1, len(lc)):
        for j in range(len(lc[i])):
            for k in range(len(lc[i][j])):
                n_inp = len(lc[i - 1]) if k == 0 else 1
                for l in range(n_inp):
                    order.append(f"conv{i}{j}{k}_{l}")
    return order


def load_tf_reference_checkpoint(ckpt_path: str,
                                 params: Dict[str, Any],
                                 trunk_layer_channels,
                                 use_pre_adv: bool = False,
                                 strict: bool = True):
    """Read a reference TF checkpoint into a copy of the flax param tree.

    Args:
      ckpt_path: checkpoint prefix (e.g. ``.../checkpoints/Liquid3d/ckpt``).
      params: template ``{'params': {...}}`` tree from ``model.init`` — the
        converted tree mirrors its structure/dtypes.
      trunk_layer_channels: the HRNet trunk ``layer_channels`` (after the
        SymNet split, i.e. ``model.layer_channels``), used to replicate the
        reference's conv creation order.
      strict: require every model variable in the checkpoint to be consumed
        and every flax param to be assigned.

    Returns:
      New param tree with the reference weights.
    """
    import tensorflow as tf  # host-only read; heavyweight, import lazily

    rd = tf.train.load_checkpoint(ckpt_path)
    shape_map = rd.get_variable_to_shape_map()
    model_vars = {k[len("model/"):-len(_VV)]
                  for k in shape_map
                  if k.startswith("model/") and k.endswith(_VV)
                  and ".OPTIMIZER_SLOT" not in k}

    conv_order = _reference_conv_order(trunk_layer_channels, use_pre_adv)

    def ckpt_prefixes(name):
        """Candidate checkpoint prefixes for one of our module names."""
        cands = []
        if name == "fluid_obs":
            cands = ["fluid_convs", "_all_convs/0/1"]
        elif name == "obs_conv":
            cands = ["obs_convs", "_all_convs/1/1"]
        elif name in ("fluid_dense", "obs_dense"):
            cands = [name]
        elif name.startswith("sym_conv"):
            n = int(name[len("sym_conv"):])
            cands = [f"sym_convs/{n}",
                     f"_all_convs/{len(conv_order) + n}/1"]
        elif name.startswith("adv_conv"):
            n = int(name[len("adv_conv"):])
            cands = [f"adv_convs/{n}", f"_all_convs/{2 + n}/1"]
        elif name.startswith("adv_dense"):
            n = int(name[len("adv_dense"):])
            cands = [f"adv_dense/{n}"]
        elif name.startswith("conv"):
            idx = conv_order.index(name)
            cands = [f"_all_convs/{idx}/1"]
        elif name.startswith("dense"):
            digits, l = name[len("dense"):].split("_")
            i, j, k = int(digits[0]), int(digits[1]), int(digits[2:])
            cands = [f"denses/{i - 1}/{j}/{k}/{l}"]
        elif name in ("scale", "rot"):  # equivar heads
            cands = [f"{name}_dens", name]
        return cands

    def fetch(prefix, leaf):
        key = f"model/{prefix}/{leaf}{_VV}"
        if f"{prefix}/{leaf}" in model_vars:
            model_vars.discard(f"{prefix}/{leaf}")
            return rd.get_tensor(key)
        return None

    consumed, missing = [], []

    def convert_module(name, tree):
        out = {}
        for cand in ckpt_prefixes(name):
            hit = False
            for leaf_name, leaf in _flatten_module(tree):
                val = fetch(cand, leaf_name)
                if val is not None:
                    want = tuple(np.shape(leaf))
                    got = tuple(val.shape)
                    if want != got:
                        raise ValueError(
                            f"{name}: checkpoint {cand}/{leaf_name} shape "
                            f"{got} != param shape {want}")
                    out[leaf_name] = val.astype(np.asarray(leaf).dtype)
                    hit = True
            if hit:
                break
        if len(out) != len(list(_flatten_module(tree))):
            missing.append(name)
            return tree
        consumed.append(name)
        return _unflatten_like(tree, out)

    new_params = {}
    for name, tree in params["params"].items():
        new_params[name] = convert_module(name, tree)

    if strict and missing:
        raise ValueError(f"unconverted flax modules: {missing}")
    if strict and model_vars:
        raise ValueError(f"unconsumed checkpoint variables: "
                         f"{sorted(model_vars)}")
    return {"params": new_params}


def _flatten_module(tree, prefix=""):
    """Yield (ckpt-style leaf name, leaf array) for one module's subtree.
    Our Dense wraps ``nn.Dense`` as 'Dense_0' — the checkpoint stores the
    kernel/bias directly under the layer, so that level is skipped."""
    for k, v in tree.items():
        name = k if not prefix else f"{prefix}/{k}"
        if k.startswith("Dense_"):
            yield from _flatten_module(v, prefix)
        elif isinstance(v, dict):
            yield from _flatten_module(v, name)
        else:
            yield name, v


def _unflatten_like(tree, flat, prefix=""):
    out = {}
    for k, v in tree.items():
        name = k if not prefix else f"{prefix}/{k}"
        if k.startswith("Dense_"):
            out[k] = _unflatten_like(v, flat, prefix)
        elif isinstance(v, dict):
            out[k] = _unflatten_like(v, flat, name)
        else:
            out[k] = np.asarray(flat[name], dtype=np.asarray(v).dtype)
    return out
