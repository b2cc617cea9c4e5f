"""Base pipeline: run directories, logging, checkpointing, summaries.

Reference: pipelines/base_pipeline.py:24-212.  Checkpoints use orbax
(params + optimizer state + step) instead of tf.train.CheckpointManager;
scalar summaries go to tensorboard event files via flax's SummaryWriter
(with a JSONL mirror for grep-ability).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils import Config, LogRecord, get_runid, make_dir

logging.setLogRecordFactory(LogRecord)
log = logging.getLogger(__name__)


class SummaryLogger:
    """Scalar summary writer: tensorboard events + metrics.jsonl mirror."""

    def __init__(self, directory):
        make_dir(directory)
        self.dir = directory
        self.jsonl = open(os.path.join(directory, "metrics.jsonl"), "a")
        try:
            # TF-free event writer: flax/TF's summary path costs ~0.4 s
            # PER SCALAR on this stack (it re-probes the device platform),
            # which capped training at ~2.3 steps/s vs the ~4 ms compiled
            # step — see utils/tb_writer.py
            from ..utils.tb_writer import TBEventWriter
            self.tb = TBEventWriter(directory)
        except Exception:  # pragma: no cover - tensorboard optional
            self.tb = None

    def scalar(self, tag, value, step):
        value = float(value)
        if self.tb is not None:
            self.tb.scalar(tag, value, step)
        self.jsonl.write(json.dumps({"tag": tag, "value": value,
                                     "step": int(step)}) + "\n")

    def text(self, tag, value, step=0):
        if self.tb is not None:
            self.tb.text(tag, value, step)

    def flush(self):
        if self.tb is not None:
            self.tb.flush()
        self.jsonl.flush()


class BasePipeline:
    """Run-dir management, checkpoint save/load, summary plumbing."""

    def __init__(self, model, dataset=None, config=None, restart=False,
                 **kwargs):
        if kwargs.get("name") is None:
            raise KeyError("pipeline needs a name")
        self.cfg = Config(kwargs)
        self.name = self.cfg.name
        self.version = self.cfg.get("version", "v0")
        self.model = model
        self.dataset = dataset
        self.model_cfg = kwargs.get("model_cfg", {})
        self.optimizer = None
        self.params = None
        self.opt_state = None

        make_dir(self.cfg.main_log_dir)
        dataset_name = dataset.name if dataset is not None else ""
        tag = f"{type(model).__name__}_{dataset_name}_{self.version}"
        self.cfg.logs_dir = os.path.join(self.cfg.main_log_dir, tag)
        if restart and os.path.exists(self.cfg.logs_dir):
            shutil.rmtree(self.cfg.logs_dir)
        make_dir(self.cfg.logs_dir)

        make_dir(self.cfg.output_dir)
        self.cfg.out_dir = os.path.join(self.cfg.output_dir, tag)
        if restart and os.path.exists(self.cfg.out_dir):
            shutil.rmtree(self.cfg.out_dir)
        make_dir(self.cfg.out_dir)

        if config is not None:
            with open(os.path.join(self.cfg.logs_dir, "config.txt"),
                      "w") as f:
                f.write(config.dump() if hasattr(config, "dump")
                        else str(config))

        tb_base = os.path.join(self.cfg.get("train_sum_dir", "./train_log"),
                               tag)
        runid = get_runid(tb_base)
        self.tensorboard_dir = os.path.join(
            self.cfg.get("train_sum_dir", "./train_log"),
            runid + "_" + Path(tb_base).name)
        self.writer = SummaryLogger(self.tensorboard_dir)
        self._every_n_minutes_last = {}

        self._ckpt_dir = os.path.abspath(
            os.path.join(self.cfg.logs_dir, "checkpoint"))
        self._ckpt_mgr = None

    # -- checkpointing --------------------------------------------------

    def _manager(self):
        if self._ckpt_mgr is None:
            make_dir(self._ckpt_dir)
            self._ckpt_mgr = ocp.CheckpointManager(
                self._ckpt_dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=int(self.cfg.get("max_ckpt_to_keep", 100))))
        return self._ckpt_mgr

    def save_ckpt(self, epoch):
        state = {"params": self.params}
        if self.opt_state is not None:
            state["opt_state"] = self.opt_state
        mgr = self._manager()
        mgr.save(epoch, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
        log.info("Saved checkpoint at epoch {}", epoch)

    def load_ckpt(self, ckpt_path=None, is_resume=True):
        """Restore params (+opt state).  Returns the epoch to resume from
        (reference semantics: latest checkpoint if no explicit path)."""
        epoch = 0
        if ckpt_path:
            path = os.path.abspath(ckpt_path)
            # accept a CheckpointManager step dir (save_ckpt layout:
            # <step>/default/...) as well as a bare StandardSave dir
            if os.path.exists(os.path.join(path, "default", "_METADATA")):
                path = os.path.join(path, "default")
            ckptr = ocp.StandardCheckpointer()
            # device-agnostic restore: build the target template from the
            # checkpoint's own metadata (shape/dtype only) so a TPU-saved
            # ckpt restores on CPU for eval and vice versa — the shardings
            # recorded at save time are ignored
            meta = ckptr.metadata(path)
            meta = getattr(meta, "item_metadata", meta)
            shard = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            template = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                               sharding=shard), meta)
            restored = ckptr.restore(path, template)
            self.params = restored["params"]
            if "opt_state" in restored and self.opt_state is not None:
                self.opt_state = restored["opt_state"]
            log.info("Restored from {}", ckpt_path)
            return epoch
        mgr = self._manager()
        latest = mgr.latest_step()
        if latest is not None and is_resume:
            if self.params is not None:
                template = {"params": self.params}
                if self.opt_state is not None:
                    template["opt_state"] = self.opt_state
                restored = mgr.restore(
                    latest, args=ocp.args.StandardRestore(template))
            else:
                # no template (eval-only restore): raw pytree of arrays
                restored = mgr.restore(latest)
            self.params = restored["params"]
            if "opt_state" in restored and self.opt_state is not None:
                self.opt_state = restored["opt_state"]
            epoch = latest * int(self.cfg.get("save_ckpt_freq", 1)) + 1
            log.info("Restored from checkpoint step {}", latest)
        else:
            log.info("Initializing from scratch.")
        return epoch

    # -- logging --------------------------------------------------------

    def log_param_count(self):
        n = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(self.params))
        log.info("###################################")
        log.info("Parameter count '{}':", type(self.model).__name__)
        log.info(" Total params: {:,}", n)
        log.info("-----------------------------------")

    def save_logs(self, writer, step, data, prefix=""):
        for d in data:
            for key, val in d.items():
                writer.scalar(os.path.join(prefix, key), val, step)
        if self.optimizer is not None and hasattr(self, "lr_schedule"):
            writer.scalar("train/learning_rate",
                          float(self.lr_schedule(step)), step)
        writer.flush()

    def log_scalar_every_n_minutes(self, writer, step, n, name, value):
        now = time.time()
        key = (n, name)
        last = self._every_n_minutes_last.get(key)
        if last is None or now - last > 60 * n:
            self._every_n_minutes_last[key] = now
            writer.scalar(name, value, step)
