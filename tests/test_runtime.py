"""Native runtime tests: PNG decode parity vs PIL, ray sampler parity vs the
jnp ray generator, tile assembly."""

import os

import numpy as np
import pytest

from nerf_tpu.runtime import (
    RayBatchSampler,
    assemble_tiles,
    decode_png_batch,
    load_library,
)


@pytest.fixture(scope="module")
def png_files(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    # RGBA with alpha gradient + plain RGB + grayscale
    rgba = (rng.uniform(0, 255, (32, 40, 4))).astype(np.uint8)
    rgba[..., 3] = np.linspace(0, 255, 40, dtype=np.uint8)[None, :]
    for name, arr, mode in [
        ("rgba.png", rgba, "RGBA"),
        ("rgb.png", rgba[..., :3], "RGB"),
        ("gray.png", rgba[..., 0], "L"),
    ]:
        p = str(d / name)
        Image.fromarray(arr, mode).save(p)
        paths.append(p)
    return paths


def test_native_library_builds():
    assert load_library() is not None, "native runtime failed to build"


def test_decode_matches_pil_no_resize(png_files):
    from nerf_tpu.data.blender import _load_image

    out = decode_png_batch(png_files, (40, 32), white_background=True)
    assert out.shape == (3, 32, 40, 3)
    for i, p in enumerate(png_files):
        ref = _load_image(p, (40, 32))
        # same size -> no resampling difference; only uint8->float rounding
        np.testing.assert_allclose(out[i], ref, atol=1.5 / 255.0)


def test_decode_resize_close_to_pil(png_files):
    out = decode_png_batch(png_files[:1], (20, 16), white_background=False)
    assert out.shape == (1, 16, 20, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_decode_missing_file_falls_back_or_reports(png_files, tmp_path):
    missing = [str(tmp_path / "nope.png")]
    with pytest.raises(Exception):
        decode_png_batch(missing, (8, 8))


def test_ray_sampler_matches_jnp_ray_generation():
    """Sampled rays must agree with utils.cameras.generate_rays for the same
    pixels — the native producer implements the same camera model."""
    import jax.numpy as jnp

    from nerf_tpu.utils.cameras import generate_rays

    rng = np.random.default_rng(1)
    n, h, w = 3, 12, 16
    images = rng.uniform(size=(n, h, w, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * n)
    poses[:, 2, 3] = 4.0
    focal = 20.0

    with RayBatchSampler(images, poses, focal, n_rays=256, seed=7) as s:
        rays_o, rays_d, rgb = s.next_batch()

    ro_full, rd_full = generate_rays(jnp.asarray(poses[0]), w, h, focal)
    ro_full = np.asarray(ro_full).reshape(-1, 3)
    rd_full = np.asarray(rd_full).reshape(-1, 3)

    # every sampled direction must exactly match some pixel's direction, and
    # its rgb must be that pixel's value in some image
    for k in range(0, 256, 37):
        d = rays_d[k]
        dists = np.linalg.norm(rd_full - d, axis=1)
        pix = int(np.argmin(dists))
        assert dists[pix] < 1e-5, f"ray {k} matches no pixel"
        np.testing.assert_allclose(rays_o[k], ro_full[pix], atol=1e-6)
        match = any(
            np.allclose(images[i].reshape(-1, 3)[pix], rgb[k], atol=1e-6)
            for i in range(n)
        )
        assert match, f"rgb of ray {k} not found at matched pixel"


def test_ray_sampler_is_productive():
    images = np.zeros((2, 8, 8, 3), np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    with RayBatchSampler(images, poses, 10.0, n_rays=64, seed=3) as s:
        batches = [s.next_batch() for _ in range(10)]
    assert len(batches) == 10
    # directions vary across batches (it's actually sampling)
    assert not np.allclose(batches[0][1], batches[1][1])


def test_assemble_tiles_roundtrip():
    rng = np.random.default_rng(2)
    frame = rng.uniform(size=(100, 4)).astype(np.float32)
    tiles = [frame[0:30], frame[30:75], frame[75:100]]
    out = assemble_tiles(tiles, [0, 30, 75], 100, 4)
    np.testing.assert_array_equal(out, frame)
