"""Synthetic ground-truth generators (test oracles + self-contained smoke
datasets).

``SPH1D``: deterministic 1D SPH column solver (reference
datasets/column_gen.py:5-185) — cubic-spline kernels, Tait pressure,
viscosity, iterative pressure projection.  Note the reference applies the
spline to *raw* distances with a 4/(3h) prefactor; with the default
radius=0.25 => h=1 this is a support-1 kernel.  We reproduce that behavior
exactly (it defines the ground truth the models are scored against).

``free_fall``: analytic ballistic sphere drop (reference
datasets/free_fall_gen.py).
"""

from __future__ import annotations

import numpy as np


class SPH1D:
    """1D column SPH solver with iterative pressure projection."""

    def __init__(self, radius=0.25, mass=1.0, dens=None, stiffness=10.0,
                 visc=1e-4, gravity=-10.0):
        self.h = 4 * radius
        self.mass = mass
        self.rest_dens = mass / (radius * 2.0) if dens is None else dens
        self.stiffness = stiffness
        self.visc = visc
        self.gravity = gravity
        self.setup(1)

    def setup(self, cnt, bcnt=2, rnd=0.0, offset=0.0):
        """Stack ``cnt`` fluid particles above ``bcnt`` boundary particles at
        spacing h/2.  Column 0 = position, 1 = velocity, 2 = mass."""
        self.bcnt = bcnt
        n = cnt + bcnt
        self.particles = np.zeros((n, 3), dtype="float32")
        self.particles[:, 0] = np.arange(n, dtype="float32") * self.h * 0.5
        if rnd > 0:
            self.particles[bcnt:, 0] += \
                np.random.normal(scale=rnd, size=cnt) * self.h
        if offset > 0:
            self.particles[bcnt:, 0] += offset
        self.particles[:, 2] = self.mass

    # -- spline kernels (support-1 on raw distances; see module docstring) --

    def _w(self, q):
        return 4 / (3 * self.h) * np.where(
            q <= 1,
            np.where(q <= 0.5, 6 * (q**3 - q**2) + 1, 2 * (1 - q) ** 3), 0)

    def _dw(self, q):
        return 4 / (3 * self.h) * np.where(
            np.abs(q) <= 1,
            np.where(np.abs(q) <= 0.5, 18 * np.sign(q) * q**2 - 12 * q,
                     -6 * np.sign(q) * (1 - np.abs(q)) ** 2), 0)

    def _dist(self, signed=False):
        x = self.particles[:, 0]
        d = x[:, None] - x[None, :]
        return d if signed else np.abs(d)

    def compute_dens(self):
        w = self._w(self._dist())
        return np.sum(self.particles[:, 2] * w, axis=1)

    def compute_pres(self, dens=None):
        dens = self.compute_dens() if dens is None else dens
        pres = np.clip(self.stiffness *
                       ((dens / self.rest_dens) ** 7 - 1), 0, None)
        pres[:self.bcnt] = pres[self.bcnt]
        return pres

    def compute_pres_grad(self, dens, pres):
        """Symmetric SPH pressure gradient: rho_i * sum_j m (p_i/rho_i^2 +
        p_j/rho_j^2) dW."""
        d = self._dist(signed=True)
        dw = self._dw(d)
        contrib = self.particles[:, 2] * (
            (pres / dens**2)[:, None] + (pres / dens**2)[None, :]) * dw
        return dens * np.sum(contrib, axis=1)

    def compute_laplace(self, dens, val):
        d = self._dist(signed=True)
        dw = self._dw(d)
        contrib = (self.particles[:, 2] / dens) * \
            (val[:, None] - val[None, :]) * d * dw
        contrib = contrib / (d**2 + 0.01 * self.h**2)
        return 2 * np.sum(contrib, axis=1)

    def compute_visc(self, dens=None):
        dens = self.compute_dens() if dens is None else dens
        return self.visc * self.compute_laplace(dens, self.particles[:, 1])

    def step(self, dt=0.1, eps=0.01, max_iter=10000, verbose=False):
        b = self.bcnt
        f_visc = self.compute_visc()[b:]
        self.particles[b:, 1] += dt * (self.gravity + f_visc)
        self.particles[b:, 0] += dt * self.particles[b:, 1]

        err = 0.0
        for i in range(max_iter):
            dens = self.compute_dens()
            pres = self.compute_pres(dens)
            err = np.max(np.clip(dens - self.rest_dens, 0, None)[b:])
            f_pres = -(self.particles[:, 2] / dens)[b:] * \
                self.compute_pres_grad(dens, pres)[b:]
            self.particles[b:, 1] += dt * f_pres / self.particles[b:, 2]
            self.particles[b:, 0] += dt**2 * f_pres / self.particles[b:, 2]
            if err < eps:
                break
        if verbose:
            print(f"iters {i + 1}/{max_iter} err {err:.5f}")


def _column_solve_jax(x0, v0, mass, bcnt, gravity, rest_dens, stiffness,
                      visc, h, timesteps, dt, eps=0.01, max_iter=10000):
    """Jit-compiled SPH1D time integration (identical math to
    :class:`SPH1D`, but the pressure-projection loop runs as a compiled
    ``lax.while_loop``).  The numpy solver spends hours in Python for the
    shipped column configs (the projection rarely converges before
    max_iter=10000 — reproduced behavior of the reference solver); this
    version generates the same dataset in seconds.
    """
    import jax
    import jax.numpy as jnp

    n = x0.shape[0]
    fluid = jnp.arange(n) >= bcnt

    def w_prefac(q, inner, outer):
        return 4 / (3 * h) * jnp.where(
            q <= 1, jnp.where(q <= 0.5, inner(q), outer(q)), 0.0)

    def kernel(q):
        return w_prefac(q, lambda q: 6 * (q**3 - q**2) + 1,
                        lambda q: 2 * (1 - q) ** 3)

    def kernel_grad(q):
        a = jnp.abs(q)
        return 4 / (3 * h) * jnp.where(
            a <= 1, jnp.where(a <= 0.5,
                              18 * jnp.sign(q) * q**2 - 12 * q,
                              -6 * jnp.sign(q) * (1 - a) ** 2), 0.0)

    def dens_of(x):
        d = jnp.abs(x[:, None] - x[None, :])
        return jnp.sum(mass * kernel(d), axis=1)

    def step(carry, _):
        x, v = carry
        x_rec, v_rec = x, v  # frame t records the PRE-step state
        # viscosity + gravity, predict
        dens = dens_of(x)
        ds = x[:, None] - x[None, :]
        lap = 2 * jnp.sum((mass / dens) * (v[:, None] - v[None, :]) * ds *
                          kernel_grad(ds) / (ds**2 + 0.01 * h**2), axis=1)
        v = jnp.where(fluid, v + dt * (gravity + visc * lap), v)
        x = jnp.where(fluid, x + dt * v, x)

        def proj_cond(c):
            x, v, err, i = c
            return jnp.logical_and(i < max_iter, err >= eps)

        def proj_body(c):
            x, v, _, i = c
            dens = dens_of(x)
            pres = jnp.clip(stiffness * ((dens / rest_dens) ** 7 - 1),
                            0.0, None)
            pres = jnp.where(jnp.arange(n) < bcnt, pres[bcnt], pres)
            err = jnp.max(jnp.where(fluid,
                                    jnp.clip(dens - rest_dens, 0.0, None),
                                    0.0))
            ds = x[:, None] - x[None, :]
            contrib = mass * ((pres / dens**2)[:, None] +
                              (pres / dens**2)[None, :]) * kernel_grad(ds)
            grad = dens * jnp.sum(contrib, axis=1)
            f_pres = -(mass / dens) * grad
            v = jnp.where(fluid, v + dt * f_pres / mass, v)
            x = jnp.where(fluid, x + dt**2 * f_pres / mass, x)
            return x, v, err, i + 1

        # match the numpy loop: first iteration always runs, exit test uses
        # the err computed inside
        x, v, _, _ = jax.lax.while_loop(
            proj_cond, proj_body, (x, v, jnp.asarray(jnp.inf), 0))
        return (x, v), (x_rec, v_rec)

    (_, _), (xs, vs) = jax.lax.scan(step, (jnp.asarray(x0),
                                           jnp.asarray(v0)), None,
                                    length=timesteps)
    return xs, vs


def _column_frames(seq, idx, res, obs_size, grav, width=1, side_walls=False):
    """1D column sequence -> list of frame dicts in the dataset schema
    (reference datasets/column_gen.py:188-263)."""
    frames = []
    for t in range(len(seq)):
        fy = seq[t, :-obs_size, 0]
        vy = seq[t, :-obs_size, 1]
        by = seq[t, -obs_size:, 0]
        z = np.zeros_like(fy)
        zb = np.zeros_like(by)
        frame = {
            "frame_id": t,
            "scene_id": "sim_%04d" % idx,
            "grav": np.array([0.0, grav, 0.0]),
            "pos": np.stack([z, fy, z], axis=-1),
            "vel": np.stack([z, vy, z], axis=-1),
            "box": np.stack([zb, by, zb], axis=-1),
            "box_normals": np.stack([zb, zb + 1, zb], axis=-1),
        }

        if width > 1:
            xs = np.stack([np.linspace(-(width - 1) * 0.25,
                                       (width - 1) * 0.25, width),
                           np.zeros(width), np.zeros(width)], axis=-1)
            frame["pos"] = (frame["pos"][:, None, :] +
                            xs[None]).reshape(-1, 3)
            frame["box"] = (frame["box"][:, None, :] +
                            xs[None]).reshape(-1, 3)
            frame["vel"] = np.repeat(frame["vel"], width, axis=0)
            frame["box_normals"] = np.repeat(frame["box_normals"], width,
                                             axis=0)
            if side_walls:
                zz = np.zeros(50)
                yy = np.arange(50, dtype="float32") * 0.5
                walls_x = [-(width + 1) * 0.25, -(width + 1) * 0.25 - 0.5,
                           (width + 1) * 0.25, (width + 1) * 0.25 + 0.5]
                walls_n = [1, 1, -1, -1]
                frame["box"] = np.concatenate(
                    [frame["box"]] + [np.stack([zz + x, yy, zz], axis=-1)
                                      for x in walls_x], axis=0)
                frame["box_normals"] = np.concatenate(
                    [frame["box_normals"]] +
                    [np.stack([zz + n, zz, zz], axis=-1) for n in walls_n],
                    axis=0)

        for k in ("pos", "vel", "box", "grav"):
            frame[k] = frame[k] / res
        frames.append(frame)
    return frames


def gen_column_data(data_cnt, timesteps, res=100, min_pts=1, max_pts=28,
                    pts_cnt=None, obs_size=2, dt=0.01, rnd=0.0, radius=0.25,
                    mass=1.0, stiffness=20.0, visc=0.1, width=1,
                    gravity=-10.0, side_walls=False, offset=0.0,
                    backend="jax"):
    """Generate ``data_cnt`` 1D column scenes of ``timesteps`` frames
    (reference datasets/column_gen.py:266-317).  Relies on the caller having
    seeded np.random (DatasetGroup does) for reproducible scene sets.

    ``backend='jax'`` (default) runs the solver as compiled code — the
    Python solver needs hours for the shipped configs because the pressure
    projection usually runs to max_iter; 'numpy' keeps the oracle path.
    """
    gravity = gravity * res
    solver = SPH1D(radius=radius, mass=mass, stiffness=stiffness, visc=visc,
                   gravity=gravity)

    if pts_cnt is None:
        if rnd > 0:
            pts_cnt = np.random.randint(min_pts, max_pts + 1, size=data_cnt)
        elif data_cnt <= max_pts - min_pts + 1:
            pts_cnt = np.sort(np.random.choice(
                np.arange(min_pts, max_pts + 1), size=data_cnt,
                replace=False))
        else:
            raise NotImplementedError(
                "data_cnt > distinct particle counts requires rnd > 0")

    solve_jit = None
    if backend == "jax":
        import jax
        from functools import partial
        solve_jit = jax.jit(partial(
            _column_solve_jax, bcnt=obs_size, gravity=gravity,
            rest_dens=solver.rest_dens, stiffness=stiffness, visc=visc,
            h=solver.h, timesteps=timesteps, dt=dt),
            static_argnames=())

    data = []
    for d in range(data_cnt):
        n = int(pts_cnt[d])
        solver.setup(n, obs_size, rnd=rnd, offset=offset)
        seq = np.empty((timesteps, n + obs_size, 2), dtype="float32")
        if backend == "jax":
            import jax
            with jax.default_device(jax.devices("cpu")[0]):
                xs, vs = solve_jit(
                    solver.particles[:, 0].astype(np.float32),
                    solver.particles[:, 1].astype(np.float32),
                    np.float32(mass))
            seq[:, :, 0] = np.asarray(xs)[:, ::-1]
            seq[:, :, 1] = np.asarray(vs)[:, ::-1]
        else:
            for t in range(timesteps):
                seq[t, :, 0] = solver.particles[::-1, 0]
                seq[t, :, 1] = solver.particles[::-1, 1]
                solver.step(dt=dt)
        data.append(_column_frames(seq, d, res, obs_size, gravity, width,
                                   side_walls))
    return data


# ---------------------------------------------------------------------------


def _sample_sphere(r, res, sres, dim=2):
    rg = np.linspace(0.5, res - 0.5, int((res - 2) * sres))
    grid = np.stack(np.meshgrid(rg,
                                rg if dim > 1 else [0.0],
                                rg if dim > 2 else [0.0],
                                indexing="ij"), axis=-1)
    center = [res / 2, res / 2 if dim > 1 else 0.0,
              res / 2 if dim > 2 else 0.0]
    keep = np.linalg.norm(grid - center, axis=-1) < r
    return grid[keep].reshape(-1, 3)


def gen_momentum_data(data_cnt=1, timesteps=50, res=100, dim=2, radius=12,
                      dt=0.01, gravity=0.0, speed=30.0):
    """Momentum-validation scenes: two particle blobs on a collision course
    with no boundary geometry (the reference's momentum / momentum_g
    validation datasets — scripts/valid.sh:15-17 — use external scenes of
    this shape; gravity=0 for 'momentum', nonzero for 'momentum_g').

    Ground truth is ballistic free flight (blobs pass through each other);
    these scenes exist to measure a learned model's *momentum drift* during
    rollout, for which the total-momentum invariant — not the trajectory —
    is the scored quantity.
    """
    g = np.array([0.0, gravity * res, 0.0])
    data = []
    for d in range(data_cnt):
        blob = _sample_sphere(radius, res, 0.5, dim)
        offset = np.array([res * 0.25, 0.0, 0.0])
        pos = np.concatenate([blob - offset, blob + offset], 0)
        vel = np.concatenate([
            np.tile([speed, 0.0, 0.0], (len(blob), 1)),
            np.tile([-speed, 0.0, 0.0], (len(blob), 1))], 0)
        seq_p, seq_v = [pos], [vel]
        for t in range(timesteps):
            v1 = seq_v[t] + dt * g
            seq_p.append(seq_p[t] + dt * v1)
            seq_v.append(v1)
        frames = []
        for t in range(len(seq_p)):
            frames.append({
                "frame_id": t,
                "scene_id": "sim_%04d" % d,
                "grav": g / res,
                "pos": (seq_p[t] / res).astype(np.float32),
                "vel": (seq_v[t] / res).astype(np.float32),
                "box": np.ones((1, 3), np.float32) * 2.0,
                "box_normals": np.zeros((1, 3), np.float32),
            })
        data.append(frames)
    return data


def gen_free_fall_data(data_cnt=1, timesteps=100, res=100, dim=2, radius=20,
                       dt=0.01, gravity=-10.0, mode=0):
    """Analytic ballistic sphere drop (reference datasets/free_fall_gen.py).
    mode 0: explicit Euler; mode 1: trapezoid position update."""
    gravity = gravity * res
    g = np.array([0.0, gravity, 0.0])
    data = []
    for d in range(data_cnt):
        pos = [_sample_sphere(radius, res, 0.5, dim)]
        vel = [np.zeros_like(pos[0])]
        for t in range(timesteps):
            v1 = vel[t] + dt * g
            if mode == 0:
                p1 = pos[t] + dt * v1
            else:
                p1 = pos[t] + dt * vel[t] + (vel[t] + v1) / 2
            pos.append(p1)
            vel.append(v1)
        frames = []
        for t in range(len(pos)):
            frames.append({
                "frame_id": t,
                "scene_id": "sim_%04d" % d,
                "grav": g / res,
                "pos": pos[t] / res,
                "vel": vel[t] / res,
                "box": np.ones((1, 3)) * 2.0,
                "box_normals": np.zeros((1, 3)),
            })
        data.append(frames)
    return data
