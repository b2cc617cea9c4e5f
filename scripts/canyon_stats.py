#!/usr/bin/env python
"""Measure canyon-regime neighbor statistics that drive the two-tier
neighbor design (VERDICT r4 item 1).

For the exact bench_canyon scene (Liquid3d config, contact crop), prints
per trunk pair (src scale -> dst scale @ radius):

  - true in-radius neighbor count distribution over queries
    (p50/p90/p99/p99.9/max) via scipy cKDTree — ground truth;
  - the current per-pair K budget, and what fraction of queries a given
    fast-K would cover.

Plus per-scale voxel occupancy vs padded capacity (right-sizing
scale_size_factor).  CPU-only.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import yaml
    from scipy.spatial import cKDTree

    from dmcf_tpu.data import read_msgpack_zst
    from dmcf_tpu.models import build_model
    from dmcf_tpu.ops.sph import get_dilated_pos, masked_positions

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = yaml.safe_load(open(os.path.join(
        root, "configs/Liquid3d.yml")))["model"]
    crop = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    cfg["boundary_crop_max"] = crop
    model = build_model(cfg)

    frame0 = read_msgpack_zst(
        "/root/reference/datasets/canyon_data/canyon.msgpack.zst")[0]
    pos = np.asarray(frame0["pos"], np.float32)
    box = np.asarray(frame0["box"], np.float32)
    n0 = pos.shape[0]
    print(f"fluid {n0}, boundary {box.shape[0]}, crop {crop}")

    # contact crop (same semantics as model._crop_boundary 'contact')
    ext = 2.0 * float(cfg["particle_radii"][-1])
    t_f = cKDTree(pos)
    w = np.asarray([len(s) for s in t_f.query_ball_point(box, ext)])
    order = np.argsort(-w)[:crop]
    keep = order[w[order] > 0]
    boxc = box[keep]
    print(f"contact boundary: {int((w > 0).sum())} in range, "
          f"{keep.size} kept")

    all_pos = np.concatenate([pos, boxc], 0)
    all_mask = np.ones(all_pos.shape[0], bool)
    n_all = all_pos.shape[0]

    # voxel pyramid (same knobs as preprocess)
    factors = cfg.get("scale_size_factor", 1.0)
    if not isinstance(factors, (list, tuple)):
        factors = [factors] * len(cfg["strides"])
    out_maxes = [n_all if s == 1 else max(8, int(np.ceil(n_all * f)))
                 for s, f in zip(cfg["strides"], factors)]
    dpos, dmask, dcount, _ = get_dilated_pos(
        jnp.asarray(all_pos), jnp.asarray(all_mask),
        list(cfg["strides"]), out_maxes,
        voxel_size=np.asarray(cfg["voxel_size"], np.float32),
        centralize=cfg.get("centralize", False),
        hyst=0.1)
    radii = [float(r) for r in cfg["particle_radii"]]
    print("\nper-scale occupancy (count / capacity):")
    for s in range(len(radii)):
        print(f"  scale {s}: {int(dcount[s])} / {dpos[s].shape[0]}")

    sets = []
    for s in range(len(radii)):
        m = np.asarray(dmask[s])
        sets.append(np.asarray(dpos[s])[m])

    print("\nper-pair true neighbor counts "
          "(src->dst@r: p50/p90/p99/p99.9/max, budget, "
          "coverage of K=64/96/128):")
    budgets = cfg.get("neighbor_k_pairs")
    for i in range(len(radii)):
        for j in range(len(radii)):
            r = radii[max(i, j)]
            tree = cKDTree(sets[i])
            cnt = np.asarray([len(x) for x in
                              tree.query_ball_point(sets[j], r)])
            b = budgets[min(i, len(budgets) - 1)][
                min(j, len(budgets[0]) - 1)] if budgets else None
            pct = np.percentile(cnt, [50, 90, 99, 99.9])
            cov = {K: float((cnt <= K).mean()) for K in (64, 96, 128, 192)}
            n_over = {K: int((cnt > K).sum()) for K in (64, 96, 128, 192)}
            print(f"  ({i}->{j})@{r:g}: Q={cnt.size} "
                  f"p50={pct[0]:.0f} p90={pct[1]:.0f} p99={pct[2]:.0f} "
                  f"p99.9={pct[3]:.0f} max={cnt.max()} K={b}")
            print(f"      frac<=K: " + " ".join(
                f"{K}:{cov[K]:.4f}({n_over[K]}over)" for K in cov))


if __name__ == "__main__":
    main()
