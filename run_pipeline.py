#!/usr/bin/env python
"""Train / validate / test entry point.

Mirrors the reference CLI (run_pipeline.py:13-154): a YAML config with
dataset/model/pipeline sections, plus arbitrary dotted overrides, e.g.

    python run_pipeline.py --cfg_file configs/column/hrnet.yml --split train \
        --pipeline.batch_size 2 --model.window poly6
"""

import argparse
import pprint
import random
import sys

import numpy as np
import yaml


def parse_args():
    parser = argparse.ArgumentParser(description="Train a network")
    parser.add_argument("-c", "--cfg_file", help="path to the config file")
    parser.add_argument("-m", "--model", help="network model")
    parser.add_argument("-p", "--pipeline", default="Simulator")
    parser.add_argument("-d", "--dataset", help="dataset")
    parser.add_argument("--cfg_model", help="path to the model config")
    parser.add_argument("--cfg_pipeline",
                        help="path to the pipeline config")
    parser.add_argument("--cfg_dataset", help="path to the dataset config")
    parser.add_argument("--dataset_path", help="path to the dataset")
    parser.add_argument("--ckpt_path", help="path to the checkpoint")
    parser.add_argument("--device", default="tpu",
                        help="device to run the pipeline (tpu|cpu)")
    parser.add_argument("--split", default="train")
    parser.add_argument("--regen", default=False, action="store_true",
                        help="regenerate data, overwrite cache")
    parser.add_argument("--restart", default=False, action="store_true",
                        help="restart training (wipes logs/outputs)")
    parser.add_argument("--main_log_dir")
    parser.add_argument("--output_dir")

    args, unknown = parser.parse_known_args()

    extra = argparse.ArgumentParser(description="Extra arguments")
    for arg in unknown:
        if arg.startswith("-"):
            extra.add_argument(arg)
    args_extra = extra.parse_args(unknown)

    print("regular arguments")
    print(yaml.dump(vars(args)))
    print("extra arguments")
    print(yaml.dump(vars(args_extra)))
    return args, vars(args_extra)


def main():
    cmd_line = " ".join(sys.argv)
    args, extra_dict = parse_args()

    random.seed(42)
    np.random.seed(42)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from dmcf_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from dmcf_tpu.data import DatasetGroup
    from dmcf_tpu.models import build_model
    from dmcf_tpu.pipelines import PIPELINES
    from dmcf_tpu.utils import Config, setup_logging

    setup_logging()

    if args.cfg_file is not None:
        cfg = Config.load_from_file(args.cfg_file)
        cfg_dataset, cfg_pipeline, cfg_model = Config.merge_cfg_file(
            cfg, args, extra_dict)
    elif args.cfg_model or args.cfg_pipeline or args.cfg_dataset:
        # sectionless per-module config files (reference
        # run_pipeline.py:122-140)
        cfg_dataset, cfg_pipeline, cfg_model = Config.merge_module_cfg_file(
            args, extra_dict)
        cfg = Config({"dataset": cfg_dataset.to_dict(),
                      "pipeline": cfg_pipeline.to_dict(),
                      "model": cfg_model.to_dict()})
        if args.model:
            cfg_model.name = args.model
        if args.pipeline:
            cfg_pipeline.name = args.pipeline
    else:
        raise ValueError("please provide --cfg_file or per-module configs")

    Pipeline = PIPELINES[cfg_pipeline.get("name", "Simulator")]

    dataset = DatasetGroup(**cfg_dataset, split=args.split,
                           regen=args.regen)
    model = build_model(cfg_model)
    pipeline = Pipeline(model, dataset, **cfg_pipeline, config=cfg,
                        restart=args.restart,
                        model_cfg=cfg_model.to_dict(),
                        loss_cfg=cfg_model.get("loss"))

    pipeline.cfg_tb = {
        "cmd_line": cmd_line,
        "dataset": pprint.pformat(cfg_dataset, indent=2),
        "model": pprint.pformat(cfg_model, indent=2),
        "pipeline": pprint.pformat(cfg_pipeline, indent=2),
    }
    pipeline.writer.text("config", str(pipeline.cfg_tb))

    if args.split == "test":
        pipeline.run_test()
    elif args.split == "valid":
        pipeline.run_valid()
    else:
        pipeline.run_train()


if __name__ == "__main__":
    main()
