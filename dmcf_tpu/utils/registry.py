"""Name -> class registries and device-name helpers.

Reference: o3d/utils/registry.py:4-85 and builder.py:17-27 (the registry is
mostly dead upstream — run_pipeline uses getattr — but it is part of the
utility surface; ``convert_device_name`` IS used by the CLI path).
"""

from __future__ import annotations


class Registry:
    def __init__(self, name):
        self.name = name
        self._registry = {}

    def get(self, key, framework=None):
        entry = self._registry.get(key)
        if isinstance(entry, dict):
            return entry.get(framework)
        return entry

    def register(self, cls=None, *, name=None, framework=None):
        def _do(cls):
            key = name or cls.__name__
            if framework is not None:
                self._registry.setdefault(key, {})[framework] = cls
            else:
                self._registry[key] = cls
            return cls
        if cls is None:
            return _do
        return _do(cls)

    def __contains__(self, key):
        return key in self._registry

    def keys(self):
        return self._registry.keys()


MODEL = Registry("model")
PIPELINE = Registry("pipeline")
DATASET = Registry("dataset")
SAMPLER = Registry("sampler")


def convert_device_name(name):
    """Normalize CLI device names to jax platforms ('tpu' | 'cpu')."""
    name = (name or "tpu").lower()
    if name in ("cpu",):
        return "cpu"
    if name in ("gpu", "cuda", "tpu", "axon") or name.startswith(
            ("cuda:", "tpu:", "gpu:")):
        return "tpu"
    raise ValueError(f"unknown device name: {name}")
