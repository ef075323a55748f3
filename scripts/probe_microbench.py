"""Microbenchmark the accel engine's grid-probe path on the TPU.

Breaks ``grid_guided_z_vals`` (ops/occupancy.py) into its parts — probe-point
materialization, the occupancy gather, the inverse-CDF redistribution — and
times each jitted in isolation at the accel-sweep config (400x300 rays,
P probes/ray) so the optimization target is measured, not guessed.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from nerf_tpu.ops.occupancy import (
    OccupancyGrid,
    grid_guided_z_vals,
    query_occupancy,
)
from nerf_tpu.utils.rendering import sample_pdf


def _sync(out):
    """Host-fetch sync: block_until_ready is unreliable on tunneled
    backends (docs/PERF.md), so fetch a scalar derived from the output."""
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, *args, n=5):
    _sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    N = 400 * 300
    P = 96
    S = 16
    G = 64
    near, far = 2.0, 6.0

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    occ = (jax.random.uniform(k1, (G * G * G,)) < 0.05).astype(jnp.float32)
    grid = OccupancyGrid(
        occupancy=occ,
        aabb_lo=jnp.full((3,), -1.5),
        aabb_hi=jnp.full((3,), 1.5),
        resolution=G,
    )
    rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, 4.0]), (N, 3))
    rd = jax.random.normal(k2, (N, 3))
    rays_d = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    rows = {}

    for stride in (1, 2, 4, 8):
        full = jax.jit(
            lambda g, ro, rdir, k=stride: grid_guided_z_vals(
                g, ro, rdir, near, far, S, n_probe=P, ray_stride=k
            )
        )
        rows[f"full_grid_guided_z_vals_stride{stride}"] = timeit(
            full, grid, rays_o, rays_d
        )

    @jax.jit
    def probe_pts(ro, rdir):
        t = (jnp.arange(P, dtype=jnp.float32) + 0.5) / P
        z = near + (far - near) * t
        z = jnp.broadcast_to(z, (ro.shape[0], P))
        return ro[:, None, :] + rdir[:, None, :] * z[..., None]

    rows["probe_points"] = timeit(probe_pts, rays_o, rays_d)
    pts = probe_pts(rays_o, rays_d)

    gather = jax.jit(lambda g, p: query_occupancy(g, p))
    rows["occupancy_gather"] = timeit(gather, grid, pts)
    occ_w = gather(grid, pts) + 1e-3

    t = (jnp.arange(P, dtype=jnp.float32) + 0.5) / P
    z_probe = jnp.broadcast_to(near + (far - near) * t, (N, P))
    pdf = jax.jit(
        lambda zp, w: jnp.sort(
            sample_pdf(zp, w, S, deterministic=True), axis=-1
        )
    )
    rows["sample_pdf_sort"] = timeit(pdf, z_probe, occ_w)

    dev = jax.devices()[0].device_kind
    print(json.dumps({"device": dev, "N": N, "P": P, "S": S, "G": G,
                      "ms": rows}, indent=1))


if __name__ == "__main__":
    main()
