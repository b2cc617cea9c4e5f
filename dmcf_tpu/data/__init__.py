from .dataflow import (Prefetcher, WindowSampler, batch_samples,
                       get_dataloader, get_rollout, pad_rollout_state)
from .dataset import Dataset, DatasetGroup, read_msgpack_zst, \
    write_msgpack_zst
from .generators import SPH1D, gen_column_data, gen_free_fall_data
from .writers import write_results

__all__ = [
    "Dataset",
    "DatasetGroup",
    "read_msgpack_zst",
    "write_msgpack_zst",
    "SPH1D",
    "gen_column_data",
    "gen_free_fall_data",
    "WindowSampler",
    "Prefetcher",
    "batch_samples",
    "get_dataloader",
    "get_rollout",
    "pad_rollout_state",
    "write_results",
]
