from .cache import Cache, get_hash
from .config import Config, ConfigDict
from .log import LogRecord, get_runid, make_dir, setup_logging
from .registry import (DATASET, MODEL, PIPELINE, SAMPLER, Registry,
                       convert_device_name)

__all__ = [
    "Config",
    "ConfigDict",
    "LogRecord",
    "get_runid",
    "make_dir",
    "setup_logging",
    "Cache",
    "get_hash",
    "Registry",
    "MODEL",
    "PIPELINE",
    "DATASET",
    "SAMPLER",
    "convert_device_name",
]
