"""Occupancy-grid accelerated sampling tests (quality-gated, not allclose:
a redistributed sample budget is a different — better-placed — estimator)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import RenderConfig, bmild_config
from nerf_tpu.models import load_bmild_weights
from nerf_tpu.ops.occupancy import (
    build_occupancy_grid,
    grid_guided_z_vals,
    query_occupancy,
)
from nerf_tpu.utils.metrics import psnr

BMILD_WEIGHTS = "/root/reference/data/lego_example_weights/model_fine_200000.npy"


@pytest.fixture(scope="module")
def lego_grid():
    params = load_bmild_weights(BMILD_WEIGHTS)
    cfg = bmild_config().model
    return build_occupancy_grid(
        params, cfg, resolution=48, density_threshold=5.0,
        compute_dtype=jnp.float32,
    )


def test_grid_occupancy_is_plausible(lego_grid):
    frac = float(jnp.mean(lego_grid.occupancy))
    # lego occupies a small but nonzero fraction of the [-1.5, 1.5] box
    assert 0.005 < frac < 0.5, f"occupied fraction {frac}"


def test_query_out_of_bounds_is_empty(lego_grid):
    pts = jnp.asarray([[10.0, 0.0, 0.0], [0.0, -99.0, 0.0]])
    occ = query_occupancy(lego_grid, pts)
    np.testing.assert_array_equal(np.asarray(occ), 0.0)


def test_query_matches_grid_cells(lego_grid):
    g = lego_grid.resolution
    occ3d = np.asarray(lego_grid.occupancy).reshape(g, g, g)
    ix, iy, iz = 24, 24, 24
    lo = float(lego_grid.aabb_lo[0])
    cell = (np.asarray([ix, iy, iz]) + 0.5) / g * 3.0 + lo
    got = float(query_occupancy(lego_grid, jnp.asarray(cell[None, :]))[0])
    assert got == occ3d[ix, iy, iz]


def test_guided_samples_concentrate_in_occupied_space(lego_grid):
    # a ray through the scene center: guided samples should land in occupied
    # cells far more often than uniform ones
    ro = jnp.asarray([[0.0, 0.0, 4.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    z = grid_guided_z_vals(lego_grid, ro, rd, 2.0, 6.0, 32)
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    hit = float(jnp.mean(query_occupancy(lego_grid, pts)))

    z_u = jnp.linspace(2.0, 6.0, 32)[None, :]
    pts_u = ro[:, None, :] + rd[:, None, :] * z_u[..., None]
    hit_u = float(jnp.mean(query_occupancy(lego_grid, pts_u)))
    assert hit > max(2 * hit_u, 0.5), f"guided {hit} vs uniform {hit_u}"
    assert bool(jnp.all(jnp.diff(z, axis=-1) >= 0))


def test_empty_ray_falls_back_to_uniformish(lego_grid):
    # a ray that misses the AABB entirely: floor keeps sampling sane
    ro = jnp.asarray([[50.0, 50.0, 50.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    z = grid_guided_z_vals(lego_grid, ro, rd, 2.0, 6.0, 16)
    assert bool(jnp.all((z >= 2.0) & (z <= 6.0)))
    assert float(jnp.std(z)) > 0.3  # spread out, not collapsed


def test_ray_stride_shares_group_leader_depths(lego_grid):
    """stride=k: every ray in a group gets exactly the z-placement its group
    leader would get at stride=1, including with a ragged tail."""
    n = 11  # deliberately not divisible by the stride
    ro = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (n, 3))
    angles = jnp.linspace(-0.3, 0.3, n)
    rd = jnp.stack(
        [jnp.sin(angles), jnp.zeros_like(angles), -jnp.cos(angles)], axis=-1
    )
    z4 = grid_guided_z_vals(lego_grid, ro, rd, 2.0, 6.0, 16, ray_stride=4)
    assert z4.shape == (n, 16)
    leaders = jnp.asarray([0, 4, 8])
    z1 = grid_guided_z_vals(
        lego_grid, ro[leaders], rd[leaders], 2.0, 6.0, 16
    )
    for g, lead in enumerate([0, 4, 8]):
        for i in range(lead, min(lead + 4, n)):
            np.testing.assert_allclose(
                np.asarray(z4[i]), np.asarray(z1[g]), rtol=0, atol=0
            )
    # deterministic inverse-CDF output must arrive sorted without a sort op
    assert bool(jnp.all(jnp.diff(z4, axis=-1) >= 0))
    assert bool(jnp.all((z4 >= 2.0) & (z4 <= 6.0)))


def test_ray_stride_stochastic_draws_stay_per_ray(lego_grid):
    """With a PRNG key, rays in one group share weights but draw
    independently — depths must differ across the group and stay sorted."""
    ro = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (4, 3))
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (4, 3))
    z = grid_guided_z_vals(
        lego_grid, ro, rd, 2.0, 6.0, 16, key=jax.random.PRNGKey(0),
        ray_stride=4,
    )
    assert z.shape == (4, 16)
    assert not np.allclose(np.asarray(z[0]), np.asarray(z[1]))
    assert bool(jnp.all(jnp.diff(z, axis=-1) >= 0))


def test_downsample_grid_is_conservative(lego_grid):
    """Max-pool mip: every occupied fine cell maps into an occupied
    supercell (dilation, never erosion)."""
    from nerf_tpu.ops.occupancy import downsample_grid

    mip = downsample_grid(lego_grid, 2)
    g = lego_grid.resolution
    assert mip.resolution == g // 2
    fine = np.asarray(lego_grid.occupancy).reshape(g, g, g)
    coarse = np.asarray(mip.occupancy).reshape(g // 2, g // 2, g // 2)
    ix, iy, iz = np.nonzero(fine)
    assert np.all(coarse[ix // 2, iy // 2, iz // 2] == 1.0)
    # and it is a max-pool, not all-ones
    assert coarse.mean() < 1.0


def test_probe_resolution_engine_knob():
    from nerf_tpu.render.engines import AccelEngine, SharedModel

    shared = SharedModel(bmild_config()).load(BMILD_WEIGHTS)
    accel = AccelEngine(shared, grid_resolution=48, probe_resolution=24)
    grid = accel.occupancy_grid()
    assert grid.resolution == 24


def test_accel_engine_beats_uniform_at_same_budget():
    """Against a converged high-spp reference, the grid-guided sample
    placement at a small budget must be at least as accurate as uniform
    placement at the same budget — that is the whole point of the engine."""
    from nerf_tpu.render.engines import AccelEngine, SharedModel, XLAEngine
    from nerf_tpu.utils.cameras import focal_from_angle, orbit_poses

    shared = SharedModel(bmild_config()).load(BMILD_WEIGHTS)
    xla = XLAEngine(shared, chunk_rays=512)
    accel = AccelEngine(shared, chunk_rays=512, grid_resolution=48)
    pose = orbit_poses(4)[0]
    focal = focal_from_angle(32, 0.6911112070083618)
    spp = 16

    gt = xla.render_image(pose, (32, 24), 192, focal=focal, monitor=False)
    uni = xla.render_image(pose, (32, 24), spp, focal=focal, monitor=False)
    acc = accel.render_image(pose, (32, 24), spp, focal=focal, monitor=False)

    p_uni = float(psnr(jnp.asarray(uni.rgb), jnp.asarray(gt.rgb)))
    p_acc = float(psnr(jnp.asarray(acc.rgb), jnp.asarray(gt.rgb)))
    print(f"uniform@{spp}: {p_uni:.1f} dB, accel@{spp}: {p_acc:.1f} dB")
    assert p_acc > p_uni - 0.5, (
        f"accel ({p_acc:.1f} dB) worse than uniform ({p_uni:.1f} dB) at spp={spp}"
    )


@pytest.fixture(scope="module")
def lego_density_grid():
    params = load_bmild_weights(BMILD_WEIGHTS)
    cfg = bmild_config().model
    return build_occupancy_grid(
        params, cfg, resolution=48, compute_dtype=jnp.float32,
        store="density",
    )


def test_density_grid_stores_raw_sigma(lego_density_grid, lego_grid):
    dens = np.asarray(lego_density_grid.occupancy)
    assert dens.min() >= 0.0
    assert dens.max() > 5.0, "lego interior should exceed the threshold"
    # thresholding the density grid reproduces the binary grid
    np.testing.assert_array_equal(
        (dens > 5.0).astype(np.float32), np.asarray(lego_grid.occupancy)
    )


def test_transmittance_weights_concentrate_at_first_surface(
    lego_density_grid,
):
    """weight_mode='transmittance' is a coarse pass from the cache: its
    samples should sit at the FIRST occupied region along the ray, not
    spread over the whole occupied column like the binary pdf."""
    ro = jnp.asarray([[0.0, 0.0, 4.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    z_t = grid_guided_z_vals(lego_density_grid, ro, rd, 2.0, 6.0, 32,
                             n_probe=96, weight_mode="transmittance")
    z_a = grid_guided_z_vals(lego_density_grid, ro, rd, 2.0, 6.0, 32,
                             n_probe=96, weight_mode="alpha")
    # sorted and in range
    for z in (z_t, z_a):
        assert float(jnp.min(jnp.diff(z, axis=-1))) >= 0.0
        assert float(z.min()) >= 2.0 and float(z.max()) <= 6.0
    # transmittance-weighted samples terminate no deeper than
    # alpha-weighted ones (later occupied cells are discounted)
    assert float(jnp.median(z_t)) <= float(jnp.median(z_a)) + 1e-6


def test_weight_modes_through_engine():
    """AccelEngine(grid_store='density', weight_mode='transmittance')
    renders a sane frame through the full pipeline (interpret mode)."""
    from nerf_tpu.render.engines import AccelEngine, SharedModel
    from nerf_tpu.utils.cameras import spherical_pose

    shared = SharedModel(bmild_config()).load(BMILD_WEIGHTS)
    eng = AccelEngine(shared, chunk_rays=512, grid_resolution=32,
                      probe_resolution=0, n_probe=32, probe_ray_stride=1,
                      grid_store="density", weight_mode="transmittance")
    res = eng.render_image(spherical_pose(30.0, -30.0, 4.0), (16, 12), 8,
                           monitor=False)
    assert np.isfinite(res.rgb).all()
    assert res.rgb.std() > 0.01
