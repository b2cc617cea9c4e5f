"""Simulator pipeline: train / valid / test / rollout orchestration.

Reference: pipelines/simulator.py:37-518.  TPU-first redesign:

* The BPTT training step is ONE jitted function per (batch-shape, window,
  warm-up, iterations) signature: warm-up runs under a vmapped
  ``lax.while_loop`` with the reference's divergence guards
  (simulator.py:335-356), the unrolled window is a ``lax.scan`` with
  ``jax.checkpoint`` on the per-step model call, gradients/Adam update
  included.  Curriculum changes (window/warm-up bounds) change static shapes
  and recompile at boundaries only.
* Test/valid rollouts run the whole horizon on device in a single
  ``lax.scan`` — no host round-trip per frame (reference feeds frames back
  through Python at simulator.py:99-106).
* Batch items are vmapped fixed-shape padded samples, not a Python loop.
"""

from __future__ import annotations

import contextlib
import functools
import logging
import os
import time
from datetime import datetime
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import get_dataloader, get_rollout, pad_rollout_state, \
    write_results
from ..models.losses import density_loss, get_loss
from ..ops.emd import emd_loss
from ..ops.windows import get_window_func
from .base import BasePipeline
from .metrics import chamfer_distance, compare_dist, distance, merge_dicts

log = logging.getLogger(__name__)


def _clip_by_norm(g, norm):
    n = jnp.sqrt(jnp.sum(g**2))
    return jnp.where(n > norm, g * (norm / n), g)


def compute_time_weights(step, window_it, windows, window_bnds, time_blend):
    """Per-unroll-step loss weights with curriculum cross-fade.

    After a window-curriculum boundary, the newly added trailing steps fade
    in linearly over ``time_blend`` optimizer steps (reference
    pipelines/simulator.py:463-476)."""
    window = windows[window_it]
    time_w = np.ones((window,), np.float32)
    if window_it > 0:
        a = (step - window_bnds[window_it - 1] + 1) / time_blend
        if a < 1.0:
            diff = windows[window_it] - windows[window_it - 1]
            time_w[-diff:] = np.clip(a - np.arange(diff) / diff, 0.0, 1.0)
    return time_w


def advance_curriculum(step, state, windows, window_bnds, max_warm_up,
                       warm_up_bnds, iterations, its_bnds):
    """Advance (window_it, warm_up_it, it_idx) past any boundaries crossed
    at ``step``; returns the new state and whether the loader must be
    rebuilt (reference pipelines/simulator.py:431-457)."""
    window_it, warm_up_it, it_idx = state
    rebuild = False
    while window_it < min(len(windows) - 1, len(window_bnds)) \
            and step >= window_bnds[window_it]:
        window_it += 1
        rebuild = True
    while warm_up_it < min(len(max_warm_up) - 1, len(warm_up_bnds)) \
            and step >= warm_up_bnds[warm_up_it]:
        warm_up_it += 1
        rebuild = True
    while it_idx < min(len(iterations) - 1, len(its_bnds)) \
            and step >= its_bnds[it_idx]:
        it_idx += 1
    return (window_it, warm_up_it, it_idx), rebuild


class Simulator(BasePipeline):
    def __init__(self, model, dataset=None, name="Simulator",
                 main_log_dir="./logs", device="tpu", split="train",
                 **kwargs):
        super().__init__(model=model, dataset=dataset, name=name,
                         main_log_dir=main_log_dir, device=device,
                         split=split, **kwargs)
        self.loss_cfg = dict(self.cfg.get("loss_cfg") or {})
        if not self.loss_cfg:
            self.loss_cfg = {
                "weighted_mse": {"typ": "weighted_mse", "fac": 1.0,
                                 "gamma": 0.25, "neighbor_scale": 0.025}}
        self.loss_fns = {k: get_loss(**dict(v))
                         for k, v in self.loss_cfg.items()}
        self._jit_cache = {}

    @contextlib.contextmanager
    def _file_log(self, split):
        """Per-run log file, detached on completion.

        The reference leaks one FileHandler per run_* call
        (pipelines/simulator.py:124,176,296), duplicating every later line
        into every older file across a long training; here the handler is
        removed and closed when the run section ends."""
        timestamp = datetime.now().strftime("%Y-%m-%d_%H:%M:%S")
        log_path = os.path.join(self.cfg.logs_dir,
                                f"log_{split}_{timestamp}.txt")
        log.info("Logging in file : {}", log_path)
        handler = logging.FileHandler(log_path)
        pkg_log = logging.getLogger("dmcf_tpu")
        pkg_log.addHandler(handler)
        try:
            yield log_path
        finally:
            pkg_log.removeHandler(handler)
            handler.close()

    # ------------------------------------------------------------------
    # single-step / rollout inference
    # ------------------------------------------------------------------

    def _model_step(self, params, sample, training=False, vel_corr=None):
        return self.model.apply(params, sample, training=training,
                                vel_corr=vel_corr)

    def _get_step_fn(self):
        if "step" not in self._jit_cache:
            self._jit_cache["step"] = jax.jit(
                lambda params, s: self._model_step(params, s)[:2])
        return self._jit_cache["step"]

    def run_inference(self, state):
        """One simulation step on a padded state dict."""
        pos, vel = self._get_step_fn()(self.params, self._strip(state))
        out = dict(state)
        out["pos"], out["vel"] = pos, vel
        return out

    @staticmethod
    def _strip(state):
        return {k: state[k] for k in ("pos", "vel", "grav", "box",
                                      "box_normals", "fluid_mask",
                                      "box_mask")
                if state.get(k) is not None}

    def _get_rollout_fn(self, timesteps):
        key = ("rollout", timesteps)
        if key not in self._jit_cache:
            def roll(params, state):
                def body(carry, _):
                    pos, vel, mx, po, av = carry
                    s = dict(state)
                    s["pos"], s["vel"] = pos, vel
                    p, v, aux = self._model_step(params, s)
                    mx = jnp.maximum(mx, aux["neighbor_overflow"])
                    po = jnp.maximum(po, aux.get("pair_overflow", po))
                    av = av + aux["avg_neighbors"]
                    return (p, v, mx, po, av), (p, v)
                (_, _, mx, po, av), (ps, vs) = jax.lax.scan(
                    body, (state["pos"], state["vel"],
                           jnp.asarray(0, jnp.int32),
                           jnp.asarray(-(2 ** 30), jnp.int32),
                           jnp.asarray(0.0)),
                    None, length=timesteps - 1)
                ps = jnp.concatenate([state["pos"][None], ps], 0)
                vs = jnp.concatenate([state["vel"][None], vs], 0)
                return ps, vs, mx, po, av / max(timesteps - 1, 1)
            self._jit_cache[key] = jax.jit(roll)
        return self._jit_cache[key]

    def run_rollout(self, rollout_data, timesteps=2, bucket=64):
        """Free rollout over full horizons, fully on device via lax.scan.
        Returns per-sequence (positions [T,N,3], velocities) plus timing.

        ``pipeline.rollout_chunk`` (default 0 = whole horizon in one
        executable) bounds the steps per device execution: very long
        executions on huge scenes can exceed the TPU runtime's
        per-execution walltime and kill the worker, so large scenes should
        set a chunk that keeps each execution to a few seconds; the host
        loop carries (pos, vel) across chunks at negligible dispatch cost.
        """
        chunk = int(self.cfg.get("rollout_chunk") or 0)
        results = []
        timings = []
        for data in rollout_data:
            state = pad_rollout_state(data, bucket=bucket)
            s0 = {k: (jnp.asarray(v) if v is not None else None)
                  for k, v in state.items() if k != "n_fluid"}
            s0_init = dict(s0)
            s0_init["pos"] = jnp.asarray(state["pos"][0])
            s0_init["vel"] = jnp.asarray(state["vel"][0])
            if state["grav"] is not None:
                s0_init["grav"] = jnp.asarray(state["grav"][0])
            else:
                s0_init["grav"] = None
            s0_init["box"] = jnp.asarray(state["box"])
            n_steps = max(timesteps - 1, 1)
            exe_steps = (min(chunk, n_steps) if chunk else n_steps)
            roll = self._get_rollout_fn(exe_steps + 1)
            strip = self._strip(s0_init)
            # AOT-compile so horizons execute in as few dispatches as
            # possible (the reference's dummy-init call, simulator.py:94,
            # re-executes the model); cache executables per shape signature
            ckey = ("rollout_exe", exe_steps,
                    tuple((k, v.shape) for k, v in sorted(strip.items())))
            if ckey not in self._jit_cache:
                self._jit_cache[ckey] = roll.lower(self.params,
                                                   strip).compile()
            compiled = self._jit_cache[ckey]
            t0 = time.time()
            ps_parts, vs_parts = [], []
            max_nbr = 0
            pair_over = -(2 ** 30)
            avg_parts = []
            done = 0
            while done < n_steps:
                ps, vs, mx, po, av = compiled(self.params, strip)
                jax.block_until_ready(ps)
                take = min(exe_steps, n_steps - done)
                # frame 0 of each chunk repeats the seed frame
                ps_parts.append(np.asarray(ps[0 if done == 0 else 1:
                                              take + 1]))
                vs_parts.append(np.asarray(vs[0 if done == 0 else 1:
                                              take + 1]))
                max_nbr = max(max_nbr, int(mx))
                pair_over = max(pair_over, int(po))
                avg_parts.append(float(av) * take)
                strip = dict(strip)
                strip["pos"], strip["vel"] = ps[take], vs[take]
                done += take
            ps = np.concatenate(ps_parts, 0)
            vs = np.concatenate(vs_parts, 0)
            avg_nbr = sum(avg_parts) / n_steps
            dt = (time.time() - t0) / n_steps
            timings.append(dt)
            n = state["n_fluid"]
            log.info("rollout {}: max_neighbors={} avg_neighbors={:.1f} "
                     "(K={})", len(results), int(max_nbr), float(avg_nbr),
                     int(getattr(self.model, "neighbor_k", 0)))
            self._check_neighbor_overflow(int(max_nbr),
                                          f"rollout {len(results)}")
            self._check_pair_overflow(pair_over, f"rollout {len(results)}")
            results.append((np.asarray(ps)[:, :n], np.asarray(vs)[:, :n]))
        log.info("Average runtime: {:.5f} s/step ({:.1f} steps/s)",
                 float(np.mean(timings)), 1.0 / max(np.mean(timings), 1e-9))
        self.last_steps_per_sec = 1.0 / max(float(np.mean(timings)), 1e-9)
        return results

    def _check_neighbor_overflow(self, max_neighbors, where):
        """Silently dropped neighbors silently change the physics: warn
        (default) or raise (``strict_overflow: true``) when the true
        neighbor count at the finest radius exceeds the padded K budget
        (SURVEY §7 'hard parts'; the reference's ragged lists cannot
        overflow, so this check is the price of fixed shapes)."""
        k = int(getattr(self.model, "neighbor_k", 0))
        if k and max_neighbors > k:
            msg = (f"neighbor overflow at {where}: max true neighbor count "
                   f"{int(max_neighbors)} > neighbor_k={k}; neighbors are "
                   f"being dropped — raise model.neighbor_k")
            if bool(self.cfg.get("strict_overflow", False)):
                raise RuntimeError(msg)
            log.warning(msg)

    def _check_pair_overflow(self, excess, where):
        """Cross-scale trunk pairs have their own K budgets
        (``model.neighbor_k_gaps``); ``excess`` is the step's worst
        ``true_count - K`` over every cached pair search."""
        if excess > 0:
            msg = (f"pair-search overflow at {where}: worst true neighbor "
                   f"count exceeds its pair K budget by {int(excess)}; "
                   f"neighbors are being dropped — raise model.neighbor_k"
                   f"_gaps (or neighbor_k)")
            if bool(self.cfg.get("strict_overflow", False)):
                raise RuntimeError(msg)
            log.warning(msg)

    # ------------------------------------------------------------------
    # test / valid
    # ------------------------------------------------------------------

    def run_test(self, epoch=None):
        with self._file_log("test"):
            return self._run_test(epoch)

    def _run_test(self, epoch=None):
        cfg = self.cfg
        dg_cfg = dict(cfg.get("data_generator") or {})
        test_cfg = dict(dg_cfg.pop("test", {}) or {})
        dg_cfg.pop("train", None)
        dg_cfg.pop("valid", None)
        test_data = get_rollout(self.dataset.test, **dg_cfg, **test_cfg)

        if epoch is None:
            if self.params is None:
                # template for device-agnostic checkpoint restore
                self.params = self._init_params_from_rollout(test_data[0])
            epoch = self.load_ckpt(self.model_cfg.get("ckpt_path"))
        log.info("Started testing")

        horizon = test_data[0]["pos"].shape[0]
        results = self.run_rollout(test_data, horizon)

        for i, (ps, vs) in enumerate(results):
            data = test_data[i]
            out_dir = os.path.join(cfg.out_dir, "visual", "%04d" % i)
            os.makedirs(out_dir, exist_ok=True)
            output = [
                (ps, {"name": "pred", "type": "PARTICLE"}),
                (data["pos"], {"name": "gt", "type": "PARTICLE"}),
                (data["box"], {"name": "bnd", "type": "PARTICLE"}),
            ]
            path = os.path.join(out_dir, "%04d.hdf5" % epoch)
            write_results(path, type(self.model).__name__, output)
            for f in glob(os.path.join(out_dir, "*.hdf5")):
                if f != path:
                    os.remove(f)

        if cfg.get("test_compute_metric", False):
            self.run_valid(epoch)

    def run_valid(self, epoch=None):
        with self._file_log("valid"):
            return self._run_valid(epoch)

    def _run_valid(self, epoch=None):
        """Validation metric suite (reference pipelines/simulator.py:167-285):
        mse, chamfer both directions, density / max-density, EMD,
        velocity-distribution KL, single-step mse.

        Device-side metrics (density, EMD, single-step mse) are evaluated
        for ALL timesteps of a sequence in ONE jitted lax.map dispatch: on
        the tunneled TPU every individual dispatch+readback serializes the
        queue at ~0.4 s, so the reference's per-timestep loop (simulator.py
        :189-263) costs minutes per validation here — batching makes the
        per-epoch valid ~free.  Host-side numpy metrics (mse, chamfer, KL)
        stay per-timestep; they are microseconds at these sizes."""
        cfg = self.cfg
        dg_cfg = dict(cfg.get("data_generator") or {})
        valid_cfg = dict(dg_cfg.pop("valid", {}) or {})
        dg_cfg.pop("train", None)
        dg_cfg.pop("test", None)
        valid_data = get_rollout(self.dataset.valid, **dg_cfg, **valid_cfg)

        if epoch is None:
            if self.params is None:
                self.params = self._init_params_from_rollout(valid_data[0])
            epoch = self.load_ckpt(self.model_cfg.get("ckpt_path"))
        log.info("Started validation")

        horizon = valid_data[0]["pos"].shape[0]
        results = self.run_rollout(valid_data, horizon)

        eval_stride = int(valid_cfg.get("eval_stride", 1))
        split = cfg.get("split", "train")
        # the reference computes the full suite only outside the train
        # split (simulator.py:227); ``valid_full_metrics: true`` forces it
        # during training so convergence of EMD/max-density is tracked
        full = bool(cfg.get("valid_full_metrics", split != "train"))

        losses = []
        for i, data in enumerate(valid_data):
            target_pos, target_vel = data["pos"], data["vel"]
            box = data["box"]
            ps, vs = results[i]
            n = target_pos.shape[1]
            dev = self._seq_device_metrics(data, ps, full)
            seq_losses = []
            for t in range(1, target_pos.shape[0]):
                if t % eval_stride != 0:
                    continue
                pos, vel = ps[t], vs[t]
                if box.shape[0] > 0:
                    pos = np.clip(pos, box.min(axis=0), box.max(axis=0))
                entry = {}
                entry["mse_val"] = float(np.mean(distance(target_pos[t],
                                                          pos)))
                entry["chamfer_val"] = float(np.mean(
                    chamfer_distance(target_pos[t], pos)))
                if full:
                    entry["dens_val"] = float(dev["dens_val"][t - 1])
                    entry["max_dens_val"] = float(
                        dev["max_dens_val"][t - 1])
                    entry["chamfer_val_2"] = float(np.mean(
                        chamfer_distance(pos, target_pos[t])))
                    entry["emd"] = float(dev["emd"][t - 1])
                    entry["vel_diff_val"] = float(
                        compare_dist(target_vel[t], vel))
                    entry["vel_diff_val_2"] = float(
                        compare_dist(vel, target_vel[t]))

                # single-step prediction from ground truth
                entry["mse_single_val"] = float(
                    dev["mse_single_val"][t - 1])

                losses.append(entry)
                seq_losses.append(entry)

            if seq_losses:
                mean_seq = merge_dicts(
                    seq_losses, lambda x, y: x + y / len(seq_losses))
                log.info("{} - {}", i, " ".join(
                    "%s: %.5f" % (k, v) for k, v in mean_seq.items()))

        loss = merge_dicts(losses, lambda x, y: x + y / max(len(losses), 1))
        loss["loss"] = sum(loss.values())
        log.info("validation of epoch {} - {} > loss: {:.5f}", epoch,
                 " ".join("%s: %.5f" % (k, v) for k, v in loss.items()
                          if k != "loss"), loss["loss"])
        self.valid_loss = loss
        return loss

    def _density_metrics(self, gt, pred, box, mask=None, bmask=None,
                         radius0=0.01):
        win_poly6 = get_window_func("poly6")
        win_dens = get_window_func(
            getattr(self.model, "window_dens", None))
        n, nb = pred.shape[0], box.shape[0]
        if mask is None:
            mask = jnp.ones((n,), bool)
        if bmask is None:
            bmask = jnp.ones((nb,), bool)
        pred_all = jnp.concatenate([pred, box], 0)
        gt_all = jnp.concatenate([gt, box], 0)
        allmask = jnp.concatenate([mask, bmask], 0)
        k = int(getattr(self.model, "neighbor_k", 64))
        dens_v = density_loss(gt, pred, mask, mask, gt_in=pred_all,
                              pred_in=gt_all, gt_in_mask=allmask,
                              pred_in_mask=allmask, win=win_poly6, k=k,
                              radius=0.005)
        maxd_v = density_loss(pred, gt, mask, mask, gt_in=pred_all,
                              pred_in=gt_all, gt_in_mask=allmask,
                              pred_in_mask=allmask, radius=radius0,
                              win=win_dens, use_max=True, k=k)
        return dens_v, maxd_v

    def _seq_device_metrics(self, data, pred, full, bucket=64):
        """All device-side valid metrics of one sequence in one dispatch.

        Returns host arrays of shape [T-1]: ``mse_single_val`` and (when
        ``full``) ``dens_val`` / ``max_dens_val`` / ``emd``; index t-1
        scores frame t."""
        state = pad_rollout_state(data, bucket=bucket)
        n = state["n_fluid"]
        pred_pad = state["pos"].copy()
        pred_pad[:, :n] = pred
        key = ("seq_metrics", bool(full), state["pos"].shape,
               state["box"].shape, state["grav"] is not None)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(functools.partial(
                self._seq_metrics_impl, full=bool(full),
                has_grav=state["grav"] is not None))
        fn = self._jit_cache[key]
        out = fn(self.params, jnp.asarray(state["pos"]),
                 jnp.asarray(state["vel"]), jnp.asarray(pred_pad),
                 jnp.asarray(state["box"]),
                 jnp.asarray(state["box_normals"]),
                 jnp.asarray(state["fluid_mask"]),
                 jnp.asarray(state["box_mask"]),
                 (jnp.asarray(state["grav"])
                  if state["grav"] is not None else None))
        jax.block_until_ready(out)
        return {k2: np.asarray(v) for k2, v in out.items()}

    def _seq_metrics_impl(self, params, gt_pos, gt_vel, pred_pos, box,
                          box_normals, fluid_mask, box_mask, grav, *,
                          full, has_grav):
        radius0 = float(self.model.particle_radii[0])
        fm = fluid_mask.astype(bool)
        bm = box_mask.astype(bool)
        n_valid = jnp.maximum(jnp.sum(fm), 1)
        big = jnp.asarray(jnp.inf, box.dtype)
        have_box = jnp.any(bm)
        lo = jnp.where(have_box,
                       jnp.min(jnp.where(bm[:, None], box, big), axis=0),
                       -big)
        hi = jnp.where(have_box,
                       jnp.max(jnp.where(bm[:, None], box, -big), axis=0),
                       big)
        base = {"box": box, "box_normals": box_normals,
                "fluid_mask": fluid_mask, "box_mask": box_mask}

        def one(xs):
            g_t, p_t, g_prev, v_prev, grav_prev = xs
            # reference clips predictions to the boundary bbox
            # (simulator.py:217-220)
            p_c = jnp.clip(p_t, lo, hi)
            s = dict(base)
            s["pos"], s["vel"] = g_prev, v_prev
            if has_grav:
                s["grav"] = grav_prev
            ps_, _, _ = self.model.apply(params, s, training=False)
            d = jnp.sqrt(jnp.sum((ps_ - g_t) ** 2, axis=-1))
            out = {"mse_single_val":
                   jnp.sum(jnp.where(fm, d, 0.0)) / n_valid}
            if full:
                dens_v, maxd_v = self._density_metrics(
                    g_t, p_c, box, mask=fm, bmask=bm, radius0=radius0)
                out["dens_val"] = dens_v
                out["max_dens_val"] = maxd_v
                nn = jnp.asarray([jnp.sum(fm)], jnp.int32)
                out["emd"] = emd_loss(g_t[None], p_c[None],
                                      n=nn, m=nn)[0]
            return out

        xs = (gt_pos[1:], pred_pos[1:], gt_pos[:-1], gt_vel[:-1],
              grav[:-1] if has_grav else gt_pos[:-1])
        return jax.lax.map(one, xs)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def _make_lr_schedule(self, opt_cfg):
        bounds = [int(b) for b in opt_cfg.get("lr_boundaries", [])]
        values = [float(v) for v in opt_cfg.get("lr_values", [1e-3])]

        def schedule(step):
            step = jnp.asarray(step)
            idx = jnp.sum(step >= jnp.asarray(bounds)) if bounds else 0
            return jnp.asarray(values)[idx]
        return schedule

    def _get_optimizer(self):
        opt_cfg = dict(self.cfg.get("optimizer") or {})
        self.lr_schedule = self._make_lr_schedule(opt_cfg)
        return optax.adam(self.lr_schedule, eps=1e-6)

    def _make_train_step(self, window, its, max_err, max_dens_err):
        return make_train_step(
            self.model, self.loss_fns, self.optimizer, window=window,
            its=its, max_err=max_err, max_dens_err=max_dens_err,
            w_decay=float(self.cfg.get("w_decay", 0) or 0),
            grad_norm=float(self.cfg.get("grad_clip_norm", -1) or -1),
            grad_accum=int(self.cfg.get("grad_accum", 1) or 1),
            host_accum=bool(self.cfg.get("grad_accum_host", False)))

    def _train_step_for(self, batch, window, its, max_err, max_dens_err):
        shape_key = ("train", batch["pos"].shape, batch["box"].shape,
                     window, its, max_err is not None,
                     max_dens_err is not None)
        if shape_key not in self._jit_cache:
            self._jit_cache[shape_key] = self._make_train_step(
                window, its, max_err, max_dens_err)
        return self._jit_cache[shape_key]

    @functools.cached_property
    def _pack_train_stats(self):
        """Concatenate the per-step telemetry into one device f32 vector
        so the training loop pays a single deferred transfer per log
        interval instead of four eager ones."""
        return jax.jit(lambda lvec, pre_eff, mx, po, av: jnp.concatenate([
            lvec.astype(jnp.float32),
            jnp.stack([jnp.mean(pre_eff.astype(jnp.float32)),
                       mx.astype(jnp.float32), po.astype(jnp.float32),
                       av.astype(jnp.float32)])]))

    def _flush_train_logs(self, queue):
        """Materialize and emit a batch of queued telemetry entries.

        On this TPU stack any device->host transfer issued while dispatches
        are in flight serializes the whole queue at ~0.4 s per pending
        step (a pure block_until_ready drains the same queue at the
        compiled step time, ~4 ms) — so telemetry buffers are accumulated
        on device and read back in ONE stacked transfer after an explicit
        drain, instead of one transfer per log interval."""
        jax.block_until_ready([e[3] for e in queue])
        mat = np.asarray(jnp.stack([e[3] for e in queue]))
        for (step, warmup_host, timesteps, _), vec in zip(queue, mat):
            self._emit_train_log((step, warmup_host, timesteps, vec))

    def _emit_train_log(self, entry):
        step, warmup_host, timesteps, packed = entry
        vec = np.asarray(packed)
        losses = {k: float(v) for k, v in zip(self.loss_fns.keys(), vec)}
        losses["loss"] = float(vec[:len(self.loss_fns)].sum())
        losses["timesteps"] = timesteps
        losses["warmup"] = warmup_host
        losses["warmup_diff"] = warmup_host - float(vec[-4])
        losses["max_neighbors"] = float(vec[-3])
        losses["avg_neighbors"] = float(vec[-1])
        self._check_neighbor_overflow(
            losses["max_neighbors"], f"train step {step}")
        self._check_pair_overflow(float(vec[-2]), f"train step {step}")
        log.info("step {} - {}", step, " ".join(
            "%s: %.5f" % (k, v) for k, v in losses.items()))
        self.save_logs(self.writer, step, [losses], "train")

    def _device_batch(self, batch):
        out = {}
        host = bool(self.cfg.get("grad_accum_host", False)) and \
            int(self.cfg.get("grad_accum", 1) or 1) > 1
        for k, v in batch.items():
            if v is None:
                continue
            # grad_accum_host: keep the batch on host — the step callable
            # uploads one micro-batch per device execution itself (host
            # slices are views; uploads are cheap and don't serialize)
            out[k] = v if host else jnp.asarray(v)
        if "grav" not in batch or batch["grav"] is None:
            out.pop("grav", None)
        if getattr(self, "mesh", None) is not None:
            if host:
                raise ValueError(
                    "grad_accum_host is a single-device mode; disable "
                    "data_parallel or grad_accum_host")
            from ..parallel import shard_batch
            out = shard_batch(out, self.mesh)
        return out

    def _setup_data_parallel(self):
        """Shard training across all visible devices when possible
        (SURVEY §2.4: first-class capability the reference lacks).

        ``data_parallel: auto`` (default) engages iff >1 device is visible
        and the batch divides evenly; ``true`` requires it; ``false``
        disables.  Params/optimizer state are placed replicated, each
        batch is sharded over the mesh's data axis, and GSPMD derives the
        gradient all-reduce over ICI from the shardings."""
        mode = self.cfg.get("data_parallel", "auto")
        n_dev = len(jax.devices())
        bs = int(self.cfg.get("batch_size", 1))
        if mode == "auto":
            enable = n_dev > 1 and bs % n_dev == 0
        else:
            enable = bool(mode)
        if not enable:
            self.mesh = None
            return
        if bs % n_dev != 0:
            raise ValueError(
                f"data_parallel: batch_size {bs} not divisible by "
                f"device count {n_dev}")
        from ..parallel import make_mesh, replicated_sharding
        self.mesh = make_mesh()
        repl = replicated_sharding(self.mesh)
        self.params = jax.device_put(self.params, repl)
        self.opt_state = jax.device_put(self.opt_state, repl)
        log.info("data-parallel training over {} devices "
                 "(per-device batch {})", n_dev, bs // n_dev)

    def run_train(self):
        with self._file_log("train"):
            return self._run_train()

    def _run_train(self):
        cfg = self.cfg
        dataset = self.dataset
        dg_cfg = dict(cfg.get("data_generator") or {})
        train_cfg = dict(dg_cfg.pop("train", {}) or {})
        dg_cfg.pop("valid", None)
        dg_cfg.pop("test", None)

        windows = list(cfg.get("windows", [2]))
        window_bnds = list(cfg.get("window_bnds", []))
        max_warm_up = list(cfg.get("max_warm_up", [0]))
        warm_up_bnds = list(cfg.get("warm_up_bnds", []))
        iterations = list(cfg.get("iterations", [0]))
        its_bnds = list(cfg.get("its_bnds", []))
        time_blend = int(cfg.get("time_blend", 1))
        max_err = cfg.get("max_err", None)
        max_dens_err = cfg.get("max_dens_err", None)

        def make_loader(window, warm):
            return get_dataloader(dataset.train,
                                  batch_size=int(cfg.batch_size),
                                  window=window, pre_frames=warm,
                                  **dg_cfg, **train_cfg)

        window_it, warm_up_it, it_idx = 0, 0, 0
        train_loader = make_loader(windows[0], max_warm_up[0])
        pending = None  # one-deep device-side batch prefetch
        log_queue = []  # deferred telemetry readbacks (see log block)
        self._time_w_cache = {}
        # opt-in loop-section timing (DMCF_LOOP_TIMING=1): accumulates
        # host-side time per section, reported every log interval
        loop_timing = bool(int(os.environ.get("DMCF_LOOP_TIMING", "0")))
        tmr = {"fetch": 0.0, "dispatch": 0.0, "prefetch": 0.0,
               "log": 0.0, "other": 0.0}
        t_prev = time.time()

        self.optimizer = self._get_optimizer()
        if self.params is None:
            self.params = self._init_params(train_loader)
        self.opt_state = self.optimizer.init(self.params)

        is_resume = bool(self.model_cfg.get("is_resume", True))
        start_ep = self.load_ckpt(self.model_cfg.get("ckpt_path"),
                                  is_resume=is_resume)
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.params)

        self._setup_data_parallel()

        log.info("Writing summary in {}.", self.tensorboard_dir)
        # pre-pay the tunnel's one-time device->host transfer setup now
        # (otherwise the first telemetry flush absorbs it mid-training)
        np.asarray(jnp.zeros((8,)))
        log.info("Started training")

        for epoch in range(start_ep, int(cfg.max_epoch) + 1):
            log.info("=== EPOCH {}/{} ===", epoch, int(cfg.max_epoch))
            for i in range(int(cfg.iter)):
                step = epoch * int(cfg.iter) + i

                (window_it, warm_up_it, it_idx), rebuild = \
                    advance_curriculum(step,
                                       (window_it, warm_up_it, it_idx),
                                       windows, window_bnds, max_warm_up,
                                       warm_up_bnds, iterations, its_bnds)
                if rebuild:
                    train_loader.close()
                    train_loader = make_loader(windows[window_it],
                                               max_warm_up[warm_up_it])
                    pending = None  # prefetched batch is stale-shaped

                if loop_timing:
                    t0 = time.time()
                    tmr["other"] += t0 - t_prev
                fetch_start = time.time()
                if pending is None:
                    batch = next(train_loader)
                    dbatch = self._device_batch(batch)
                else:
                    batch, dbatch = pending
                window = windows[window_it]
                time_w = compute_time_weights(step, window_it, windows,
                                              window_bnds, time_blend)
                key = tuple(float(w) for w in time_w)
                dtime_w = self._time_w_cache.get(key)
                if dtime_w is None:
                    dtime_w = self._time_w_cache[key] = jnp.asarray(time_w)

                self.log_scalar_every_n_minutes(
                    self.writer, step, 5, "DataLatency",
                    time.time() - fetch_start)

                if loop_timing:
                    t1 = time.time()
                    tmr["fetch"] += t1 - t0
                train_step = self._train_step_for(
                    batch, window, iterations[it_idx], max_err, max_dens_err)

                # optional profiler capture (reference has only hand-rolled
                # wall-clock timing; SURVEY §5.1 calls for jax.profiler)
                profile_at = int(cfg.get("profile_step", -1))
                if step == profile_at:
                    jax.profiler.start_trace(
                        os.path.join(cfg.logs_dir, "profile"))
                self.params, self.opt_state, lvec, pre_eff, nbr_stats = \
                    train_step(self.params, self.opt_state, dbatch,
                               dtime_w)
                if loop_timing:
                    t2 = time.time()
                    tmr["dispatch"] += t2 - t1
                # prefetch the next batch while the step runs on device:
                # the host->device upload (tunnel RTT at TPU distance) is
                # the train loop's serial overhead, so overlap it with
                # compute (async dispatch) instead of paying it per step
                nxt = next(train_loader)
                pending = (nxt, self._device_batch(nxt))
                if loop_timing:
                    t3 = time.time()
                    tmr["prefetch"] += t3 - t2
                if step == profile_at:
                    jax.block_until_ready(lvec)
                    jax.profiler.stop_trace()
                    log.info("profiler trace written to {}",
                             os.path.join(cfg.logs_dir, "profile"))

                if i == 0 and epoch == start_ep:
                    self.log_param_count()

                if loop_timing:
                    t_prev = time.time()
                if i % int(cfg.get("log_every", 10)) == 0:
                    # ONE packed device array, materialized a log-interval
                    # LATE: a device->host sync issued right after a
                    # dispatch drains the tunnel's whole in-flight queue at
                    # ~0.4 s per pending step (measured: 8 s per sync at
                    # log_every 20 vs a 3.6 ms compiled step).  Reading the
                    # previous interval's long-completed buffer instead
                    # keeps the dispatch queue deep and the sync ~free.
                    packed = self._pack_train_stats(
                        lvec, pre_eff, nbr_stats["max_neighbors"],
                        nbr_stats["pair_overflow"],
                        nbr_stats["avg_neighbors"])
                    log_queue.append((step, float(np.mean(batch["pre"])),
                                      float(np.sum(time_w)), packed))
                    if len(log_queue) >= int(cfg.get("log_flush_steps",
                                                     1000)):
                        self._flush_train_logs(log_queue)
                        log_queue = []
                    if loop_timing:
                        tmr["log"] += time.time() - t3
                        log.info("loop timing (s since last): " + " ".join(
                            "%s=%.2f" % (k, v) for k, v in tmr.items()))
                        tmr = {k: 0.0 for k in tmr}

            if log_queue:
                self._flush_train_logs(log_queue)
                log_queue = []

            if epoch % int(cfg.get("save_ckpt_freq", 1)) == 0:
                self.save_ckpt(epoch)

            # True = every epoch (reference simulator.py:515-518),
            # False/0 = never, int N = every N epochs
            valid_every = cfg.get("run_valid_every_epoch", True)
            if valid_every and epoch % max(int(valid_every), 1) == 0:
                self.run_valid(epoch)
                self.save_logs(self.writer, epoch, [self.valid_loss],
                               "valid")
            test_every = cfg.get("run_test_every_epoch", True)
            if test_every and epoch % max(int(test_every), 1) == 0:
                self.run_test(epoch)

        train_loader.close()
        self._log_peak_hbm()

    def _log_peak_hbm(self):
        """Record the device's peak memory if the backend exposes it
        (TPU does; CPU returns None) — the number the window-curriculum
        memory proofs in REPORT_QUALITY cite."""
        try:
            stats = jax.devices()[0].memory_stats()
        except Exception:  # pragma: no cover - backend-dependent
            stats = None
        if stats and "peak_bytes_in_use" in stats:
            peak = int(stats["peak_bytes_in_use"])
            log.info("peak HBM in use: {:.2f} GiB", peak / 2 ** 30)
            self.writer.scalar("train/peak_hbm_gib", peak / 2 ** 30, 0)

    def _init_params_from_rollout(self, data, bucket=64):
        """Init parameter + optimizer-state templates from a rollout
        sequence (eval-mode checkpoint restores need a target pytree
        matching the saved tree so orbax places arrays on the current
        backend instead of the saved device)."""
        state = pad_rollout_state(data, bucket=bucket)
        s = {"pos": jnp.asarray(state["pos"][0]),
             "vel": jnp.asarray(state["vel"][0]),
             "box": jnp.asarray(state["box"]),
             "box_normals": jnp.asarray(state["box_normals"]),
             "fluid_mask": jnp.asarray(state["fluid_mask"]),
             "box_mask": jnp.asarray(state["box_mask"])}
        if state["grav"] is not None:
            s["grav"] = jnp.asarray(state["grav"][0])
        init = jax.jit(lambda key, x: self.model.init(key, x,
                                                      training=False))
        params = init(jax.random.PRNGKey(int(self.cfg.get("seed", 42))), s)
        if self.optimizer is None:
            self.optimizer = self._get_optimizer()
            self.opt_state = self.optimizer.init(params)
        return params

    def _init_params(self, loader):
        batch = next(loader)
        sample = {k: jnp.asarray(v[0]) for k, v in batch.items()
                  if v is not None and k not in ("pre",)}
        sample["pos"] = sample["pos"][0]
        sample["vel"] = sample["vel"][0]
        if "grav" in sample:
            sample["grav"] = sample["grav"][0]
        init = jax.jit(lambda key, s: self.model.init(key, s,
                                                      training=False))
        return init(jax.random.PRNGKey(int(self.cfg.get("seed", 42))),
                    sample)



def make_train_step(model, loss_fns, optimizer, *, window, its=0,
                    max_err=None, max_dens_err=None, w_decay=0.0,
                    grad_norm=-1.0, grad_accum=1, host_accum=False):
    """Build the jitted BPTT train step (standalone; used by the pipeline,
    the benchmark harness, and the multi-chip dry run).

    Signature of the returned function:
        (params, opt_state, batch, time_w) ->
            (params, opt_state, loss_vector, pre_effective, stats)
    ``stats`` carries the neighbor-budget health of the step:
    ``max_neighbors`` (max true neighbor count at the finest radius —
    > neighbor_k means silently dropped neighbors) and ``avg_neighbors``
    (the reference's per-conv ``_avg_neighbors`` debug stat,
    utils/convolutions.py:384-388).
    All control flow is compiler-friendly: vmapped lax.while_loop warm-up,
    lax.scan window unroll with jax.checkpoint, no data-dependent Python.
    """
    win_dens = get_window_func(getattr(model, "window_dens", None))
    radius0 = float(model.particle_radii[0])
    k = int(getattr(model, "neighbor_k", 64))
    loss_keys = list(loss_fns.keys())

    def eval_losses(sample, pos, vel, aux, target, target_prev, pre_eff):
        mask = sample["fluid_mask"]
        return {name: fn(target, pos, mask,
                         num_fluid_neighbors=aux["num_fluid_neighbors"],
                         input_pos=sample["pos"], target_prev=target_prev,
                         pre_steps=pre_eff,
                         pos_correction=aux["pos_correction"])
                for name, fn in loss_fns.items()}

    def loss_for_step(params, sample, target, target_prev, pre_eff):
        pos, vel, aux = model.apply(params, sample, training=True)
        losses = [eval_losses(sample, pos, vel, aux, target, target_prev,
                              pre_eff)]
        for _ in range(1, max(its, 1)):
            pos, vel, aux = model.apply(params, sample, training=True,
                                        vel_corr=vel)
            losses.append(eval_losses(sample, pos, vel, aux, target,
                                      target_prev, pre_eff))
        mean = {k2: sum(d[k2] for d in losses) / len(losses)
                for k2 in losses[0]}
        stats = (aux["neighbor_overflow"].astype(jnp.float32),
                 aux.get("pair_overflow",
                         jnp.asarray(-(2 ** 30))).astype(jnp.float32),
                 aux["avg_neighbors"])
        return pos, vel, mean, stats

    def warmup(params, item):
        """Self-rollout warm-up with divergence guards (no grads)."""
        pre = item["pre"]
        base = {k2: item[k2] for k2 in ("box", "box_normals",
                                        "fluid_mask", "box_mask")}
        grav0 = item["grav"][0] if item.get("grav") is not None else None

        def make_sample(pos, vel):
            s = dict(base)
            s["pos"], s["vel"] = pos, vel
            if grav0 is not None:
                s["grav"] = grav0
            return s

        def cond(carry):
            p, pos, vel, prev_err, prev_derr, stopped = carry
            return jnp.logical_and(p < pre, jnp.logical_not(stopped))

        def body(carry):
            p, pos, vel, prev_err, prev_derr, stopped = carry
            s = make_sample(pos, vel)
            # training=True: take the LAZY per-pair search path.  The
            # batched prefetch pads every pair to the max pair size, and
            # under the vmapped batch that inflates the step's dominant
            # [batch*pairs*Q*K, 3] position gathers ~4-6x at small scenes
            # (traced: 2x15 ms per warm-up forward vs ~2 ms lazy).  No
            # dropout-style semantics depend on the flag, so this only
            # selects the execution strategy.
            pos2, vel2, _ = model.apply(params, s, training=True)
            diverged = jnp.asarray(False)
            err = prev_err
            derr = prev_derr
            if max_err is not None:
                tgt = item["pos"][p]
                err = jnp.max(jnp.where(
                    item["fluid_mask"],
                    jnp.sum(jnp.abs(pos2 - tgt), -1), 0.0))
                diverged |= (p > 0) & (err > prev_err) & (err > max_err)
            if max_dens_err is not None:
                tgt = item["pos"][p]
                fm = item["fluid_mask"]
                bm = item["box_mask"]
                allm = jnp.concatenate([fm, bm])
                derr = density_loss(
                    pos2, tgt, fm, fm,
                    gt_in=jnp.concatenate([pos2, item["box"]], 0),
                    pred_in=jnp.concatenate([tgt, item["box"]], 0),
                    gt_in_mask=allm, pred_in_mask=allm,
                    radius=radius0, win=win_dens, use_max=True, k=k)
                diverged |= (p > 0) & (derr > prev_derr) & \
                    (derr > max_dens_err)
            # on divergence: stop WITHOUT committing this step
            pos_n = jnp.where(diverged, pos, pos2)
            vel_n = jnp.where(diverged, vel, vel2)
            p_n = jnp.where(diverged, p, p + 1)
            return (p_n, pos_n, vel_n, err, derr, diverged)

        p0 = jnp.asarray(0, jnp.int32)
        carry = (p0, item["pos"][0], item["vel"][0],
                 jnp.asarray(0.0), jnp.asarray(0.0),
                 jnp.asarray(False))
        p, pos, vel, _, _, _ = jax.lax.while_loop(cond, body, carry)
        # reference reports the final loop counter (simulator.py:359):
        # pre-1 when completed, break-point otherwise
        pre_eff = jnp.where(p == pre, jnp.maximum(pre - 1, 0), p)
        return pos, vel, pre_eff

    def per_item(params, item, pos0, vel0, pre_eff, time_w):
        base = {k2: item[k2] for k2 in ("box", "box_normals",
                                        "fluid_mask", "box_mask")}
        grav0 = item["grav"][0] if item.get("grav") is not None else None

        def step(carry, t):
            pos, vel = carry
            s = dict(base)
            s["pos"], s["vel"] = pos, vel
            if grav0 is not None:
                s["grav"] = grav0
            target = jnp.take(item["pos"], t + pre_eff + 1, axis=0)
            target_prev = jnp.take(item["pos"], t + pre_eff, axis=0)
            pos2, vel2, losses, stats = loss_for_step(
                params, s, target, target_prev, pre_eff)
            lvec = jnp.stack([losses[k2] for k2 in loss_keys])
            return (pos2, vel2), (lvec * time_w[t], stats)

        # Remat policy, measured on TPU (scripts/probe_train_variants.py,
        # wide-column scene): saving the checkpoint_name'd neighbor lists
        # and/or tap tensors across the fwd/bwd boundary LOSES to full
        # recompute (774 ms plain vs 1080/1170/1262 ms saving) — at small
        # N the step is op-bound and the saved residuals' materialization
        # costs more than recomputing the search.  Default is therefore
        # plain jax.checkpoint; DMCF_SAVE_SEARCHES=all|nbr keeps the
        # alternative policies available for large-N regimes where
        # recompute is the expensive side.
        save_mode = os.environ.get("DMCF_SAVE_SEARCHES", "0")
        if save_mode == "full":
            # no rematerialization: save every intermediate across the
            # fwd/bwd boundary.  At small scenes the whole window's
            # residuals are a few hundred MB — recomputing the forward in
            # the backward (what jax.checkpoint trades memory for) only
            # re-pays the step's op-bound gather/sort machinery.
            ckpt_step = step
        elif save_mode == "0":
            ckpt_step = jax.checkpoint(step)
        else:
            names = ("dmcf_nbr",) if save_mode == "nbr" else (
                "dmcf_nbr", "dmcf_taps")
            ckpt_step = jax.checkpoint(
                step,
                policy=jax.checkpoint_policies.save_only_these_names(
                    *names))
        (pos, vel), (lvecs, stats) = jax.lax.scan(
            ckpt_step, (pos0, vel0), jnp.arange(window))
        max_nbr, pair_over, avg_nbr = stats
        return (jnp.sum(lvecs, axis=0),
                (jnp.max(max_nbr), jnp.max(pair_over), jnp.mean(avg_nbr)))

    def train_step_accum(params, opt_state, batch, time_w):
        """Micro-batched BPTT step: identical math to ``train_step`` at
        1/``grad_accum`` the activation footprint.

        The batch is split into ``grad_accum`` groups scanned sequentially;
        each group's loss is normalized by the FULL-batch denominator so the
        summed gradients equal the full-batch gradient exactly (the loss is
        a plain sum over items).  This is the single-chip equivalent of the
        DP sharding in ``_setup_data_parallel`` — batch-16 x window-20
        WaterRamps BPTT does not fit one v5e's HBM any other way."""
        ga = int(grad_accum)
        B = batch["pos"].shape[0]
        assert B % ga == 0, f"grad_accum {ga} must divide batch {B}"
        mb = B // ga
        groups = jax.tree.map(
            lambda x: x.reshape(ga, mb, *x.shape[1:]), batch)

        # warm-up per group (lax.map is sequential: bounds the forward
        # transients the same way the grad scan bounds the residuals)
        def warm_group(items):
            return jax.vmap(lambda item: warmup(params, item))(items)

        pos0, vel0, pre_eff = jax.lax.map(warm_group, groups)
        pos0 = jax.lax.stop_gradient(pos0)
        vel0 = jax.lax.stop_gradient(vel0)

        denom = jnp.sum(time_w) * B

        def group_loss(params, items, p0, v0, pe):
            lvecs, (max_nbr, pair_over, avg_nbr) = jax.vmap(
                lambda item, a, b, c: per_item(params, item, a, b, c,
                                               time_w))(items, p0, v0, pe)
            lvec = jnp.sum(lvecs, axis=0) / denom
            stats = (jnp.max(max_nbr), jnp.max(pair_over),
                     jnp.mean(avg_nbr))
            return jnp.sum(lvec), (lvec, stats)

        def acc_body(carry, xs):
            gacc, lacc, mx0, po0, av0 = carry
            items, p0, v0, pe = xs
            (_, (lvec, (mx, po, av))), g = jax.value_and_grad(
                group_loss, has_aux=True)(params, items, p0, v0, pe)
            carry = (jax.tree.map(jnp.add, gacc, g), lacc + lvec,
                     jnp.maximum(mx0, mx), jnp.maximum(po0, po), av0 + av)
            return carry, None

        init = (jax.tree.map(jnp.zeros_like, params),
                jnp.zeros((len(loss_keys),), jnp.float32),
                jnp.float32(-jnp.inf), jnp.float32(-jnp.inf),
                jnp.float32(0.0))
        (grads, lvec, mx, po, av), _ = jax.lax.scan(
            acc_body, init, (groups, pos0, vel0, pre_eff))
        grads = _finish_grads(params, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        stats = {"max_neighbors": mx, "pair_overflow": po,
                 "avg_neighbors": av / ga}
        return (params, opt_state, lvec,
                pre_eff.reshape(B, *pre_eff.shape[2:]), stats)

    def train_step(params, opt_state, batch, time_w):
        # warm-up self-rollout outside the differentiated region
        # (reference runs it before the GradientTape,
        # pipelines/simulator.py:320-361)
        pos0, vel0, pre_eff = jax.vmap(
            lambda item: warmup(params, item))(batch)
        pos0 = jax.lax.stop_gradient(pos0)
        vel0 = jax.lax.stop_gradient(vel0)

        def loss_fn(params):
            lvecs, (max_nbr, pair_over, avg_nbr) = jax.vmap(
                lambda item, p0, v0, pe: per_item(params, item, p0, v0,
                                                  pe, time_w))(
                batch, pos0, vel0, pre_eff)
            denom = jnp.sum(time_w) * lvecs.shape[0]
            lvec = jnp.sum(lvecs, axis=0) / denom
            total = jnp.sum(lvec)
            if w_decay > 0:
                total = total + w_decay * sum(
                    jnp.sum(w**2) for w in jax.tree.leaves(params))
            stats = {"max_neighbors": jnp.max(max_nbr),
                     "pair_overflow": jnp.max(pair_over),
                     "avg_neighbors": jnp.mean(avg_nbr)}
            return total, (lvec, stats)

        (total, (lvec, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if grad_norm > 0:
            grads = jax.tree.map(
                lambda g: _clip_by_norm(g, grad_norm), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lvec, pre_eff, stats

    def _finish_grads(params, grads):
        if w_decay > 0:
            grads = jax.tree.map(lambda g, p: g + 2.0 * w_decay * p,
                                 grads, params)
        if grad_norm > 0:
            grads = jax.tree.map(
                lambda g: _clip_by_norm(g, grad_norm), grads)
        return grads

    def micro_step(params, items, time_w):
        """One micro-batch's gradient, normalized by the FULL-batch
        denominator (see ``train_step_accum``): summing micro grads over
        ``grad_accum`` calls reproduces the full-batch gradient exactly."""
        pos0, vel0, pre_eff = jax.vmap(
            lambda item: warmup(params, item))(items)
        pos0 = jax.lax.stop_gradient(pos0)
        vel0 = jax.lax.stop_gradient(vel0)
        mb = pre_eff.shape[0]
        denom = jnp.sum(time_w) * (mb * int(grad_accum))

        def loss_fn(params):
            lvecs, (mx, po, av) = jax.vmap(
                lambda item, a, b, c: per_item(params, item, a, b, c,
                                               time_w))(
                items, pos0, vel0, pre_eff)
            lvec = jnp.sum(lvecs, axis=0) / denom
            return jnp.sum(lvec), (lvec, (jnp.max(mx), jnp.max(po),
                                          jnp.mean(av)))

        (_, (lvec, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, lvec, stats, pre_eff

    def combine(acc, new):
        g0, l0, m0, p0, a0 = acc
        g1, l1, m1, p1, a1 = new
        return (jax.tree.map(jnp.add, g0, g1), l0 + l1,
                jnp.maximum(m0, m1), jnp.maximum(p0, p1), a0 + a1)

    def apply_grads(params, opt_state, grads):
        grads = _finish_grads(params, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    if host_accum and int(grad_accum) > 1:
        # HOST-side accumulation: one device execution per micro-batch.
        # The in-graph scan (``train_step_accum``) runs the whole batch in
        # a single device execution, which at batch 16 x window 20 exceeds
        # the TPU runtime's per-execution walltime (~15-30 s kills the
        # worker).  Here each micro-batch is its own bounded execution;
        # grads/telemetry stay ON DEVICE between executions (tiny jitted
        # combine), so no transfer serializes the dispatch queue, and the
        # final optimizer update donates params/opt_state as before.
        micro_jit = jax.jit(micro_step)
        combine_jit = jax.jit(combine, donate_argnums=(0,))
        apply_jit = jax.jit(apply_grads, donate_argnums=(0, 1, 2))

        def train_step_host(params, opt_state, batch, time_w):
            ga = int(grad_accum)
            B = batch["pos"].shape[0]
            assert B % ga == 0, f"grad_accum {ga} must divide batch {B}"
            mb = B // ga
            acc = None
            pres = []
            for gi in range(ga):
                items = {k2: v[gi * mb:(gi + 1) * mb]
                         for k2, v in batch.items()}
                grads, lvec, (mx, po, av), pre_eff = micro_jit(
                    params, items, time_w)
                new = (grads, lvec, mx, po, av)
                acc = new if acc is None else combine_jit(acc, new)
                pres.append(pre_eff)
            grads, lvec, mx, po, av = acc
            params, opt_state = apply_jit(params, opt_state, grads)
            pre_eff = jnp.concatenate(pres, axis=0)
            stats = {"max_neighbors": mx, "pair_overflow": po,
                     "avg_neighbors": av / ga}
            return params, opt_state, lvec, pre_eff, stats

        train_step_host.host_accum = True
        return train_step_host

    # donate params/opt_state: the update happens "in place", halving the
    # peak footprint of the optimizer step
    fn = train_step_accum if int(grad_accum) > 1 else train_step
    return jax.jit(fn, donate_argnums=(0, 1))
