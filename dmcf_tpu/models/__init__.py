"""Model registry and config -> module construction.

Reference exposure: models/__init__.py re-exports HRNet, SymNet, CConv,
PointNet; run_pipeline.py:105-119 instantiates by name with the YAML model
section as kwargs.  ``build_model`` performs that translation for the flax
modules (tuple-ification, SymNet's layer_channels trunk/ASCC split, dropping
bookkeeping keys).
"""

from __future__ import annotations

import logging

from .cconv_net import CConv
from .hrnet import HRNet
from .pbf import PBFNet
from .pointnet import PointNet
from .symnet import SymNet

log = logging.getLogger(__name__)

MODELS = {
    "HRNet": HRNet,
    "SymNet": SymNet,
    "CConv": CConv,
    "PointNet": PointNet,
}

# keys consumed by the pipeline/bookkeeping, not the module
# ("loss" configures the pipeline's loss factory; see pipelines/simulator)
_NON_MODULE_KEYS = {"name", "ckpt_path", "is_resume", "device", "loss"}


def _tupleize(x):
    if isinstance(x, (list, tuple)):
        return tuple(_tupleize(v) for v in x)
    return x


def build_model(cfg: dict):
    """Instantiate a model module from a YAML ``model:`` section dict."""
    cfg = dict(cfg)
    name = cfg.get("name", "SymNet")
    if name not in MODELS:
        raise KeyError(f"unknown model: {name}")
    cls = MODELS[name]

    kwargs = {}
    fields = set(cls.__dataclass_fields__.keys())
    for k, v in cfg.items():
        if k in _NON_MODULE_KEYS:
            continue
        if k not in fields:
            log.warning("model config key '%s' not used by %s", k, name)
            continue
        if isinstance(v, (list, tuple)):
            v = _tupleize(v)
        if isinstance(v, dict):
            v = dict(v)
        kwargs[k] = v

    if name == "SymNet":
        lc = kwargs.get("layer_channels", SymNet.layer_channels)
        # reference split: trunk = layer_channels[:-1], ASCC stack =
        # layer_channels[-1][-1] (models/sym_net.py:25,34-37)
        kwargs["sym_channels"] = _tupleize(lc[-1][-1]) if isinstance(
            lc[-1][-1], (list, tuple)) else (lc[-1][-1],)
        kwargs["layer_channels"] = _tupleize(lc[:-1])
        kwargs.setdefault("channels", kwargs["layer_channels"][0][0][0]
                          if isinstance(kwargs["layer_channels"][0][0],
                                        tuple)
                          else kwargs["layer_channels"][0][0])
    elif name == "HRNet":
        lc = kwargs.get("layer_channels", HRNet.layer_channels)
        kwargs["layer_channels"] = _tupleize(lc)
        first = kwargs["layer_channels"][0][0]
        kwargs.setdefault("channels",
                          first[0] if isinstance(first, tuple) else first)
    elif name in ("CConv", "PointNet"):
        lc = _tupleize(cfg.get("layer_channels", cls.layer_channels))
        kwargs["layer_channels"] = lc
        kwargs.setdefault("channels", lc[0])

    return cls(**kwargs)


__all__ = ["PBFNet", "HRNet", "SymNet", "CConv", "PointNet", "MODELS",
           "build_model"]
