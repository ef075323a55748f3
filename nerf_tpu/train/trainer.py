"""NeRF trainer: a fully jitted train step + an orchestration loop.

Capability parity with reference ``src/training/trainer.py`` (NeRFTrainer):
coarse+fine models under a single Adam optimizer (``trainer.py:54-59``),
per-step exponential LR decay ``lr * decay^(step/decay_steps)``
(``trainer.py:62-64,136``), per-image random ray subsets
(``trainer.py:102-114``), loss = MSE(coarse) + MSE(fine)
(``trainer.py:120-122``), global grad-norm clipping (``trainer.py:129-133``),
periodic validation on <=5 images (``trainer.py:140-170``), epoch-granular
checkpointing with auto-resume (``trainer.py:182-211``), and a loss-curve PNG
(``trainer.py:404-423``).

TPU-first design: the entire step — ray generation, random ray selection,
stratified + importance sampling, both MLP evaluations, compositing, loss,
backward, optimizer update — is ONE jitted function of (state, image, pose,
focal, key). No host round-trips inside the hot loop; the only host work per
step is feeding the next image. bf16 matmuls with f32 params/accumulation.
The same step jits under a Mesh with sharded rays (see ``parallel/``).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from nerf_tpu.config import Config
from nerf_tpu.models.nerf import NeRFParams, apply_nerf, init_nerf_params
from nerf_tpu.render.pipeline import render_rays
from nerf_tpu.train import checkpoint as ckpt
from nerf_tpu.utils.cameras import generate_rays
from nerf_tpu.utils.metrics import psnr_from_mse


class TrainState(NamedTuple):
    params: Dict[str, NeRFParams]   # {'coarse': ..., 'fine': ...}
    opt_state: Any
    step: jnp.ndarray               # scalar int32


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Single optimizer over both param sets, matching the reference: Adam
    with L2-in-gradient weight decay (torch ``Adam(weight_decay=...)``),
    global-norm clip, and the per-step exponential schedule."""
    schedule = optax.exponential_decay(
        init_value=cfg.train.learning_rate,
        transition_steps=cfg.train.lr_decay_steps,
        decay_rate=cfg.train.lr_decay,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def init_train_state(key: jax.Array, cfg: Config) -> TrainState:
    kc, kf = jax.random.split(key)
    params = {
        "coarse": init_nerf_params(kc, cfg.model),
        "fine": init_nerf_params(kf, cfg.model),
    }
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: Config, img_hw: Tuple[int, int], apply_fn=apply_nerf,
                    donate: bool = True, ray_sharding=None, jit: bool = True):
    """Build the jitted train step for a fixed image shape.

    Returns ``step_fn(state, image [H,W,3], pose [4,4], focal, key) ->
    (state, metrics)`` where metrics = {loss, loss_coarse, loss_fine, psnr}.

    ``ray_sharding``: optional ``NamedSharding`` constraining the selected ray
    batch — the data-parallel axis for sharded training (``parallel/``); XLA
    derives the gradient all-reduce from it.
    """
    H, W = img_hw
    optimizer = make_optimizer(cfg)
    dt = jnp.dtype(cfg.train.compute_dtype)

    def loss_fn(params, rays_o, rays_d, target, key):
        result = render_rays(
            params["coarse"], params["fine"], rays_o, rays_d,
            cfg.model, cfg.render, key=key,
            perturb=cfg.render.perturb, compute_dtype=dt, apply_fn=apply_fn,
        )
        loss_c = jnp.mean((result.coarse.rgb - target) ** 2)
        loss_f = jnp.mean((result.fine.rgb - target) ** 2)
        return loss_c + loss_f, (loss_c, loss_f)

    def step_fn(state: TrainState, image, pose, focal, key):
        k_sel, k_render = jax.random.split(key)
        # O(n_rays) ray selection: draw pixel ids, then evaluate the camera
        # model closed-form for just those pixels. The reference materializes
        # the full H*W ray grid and randperms it every step
        # (``trainer.py:102-114``) — O(H*W) work (and a 640k-element sort)
        # for an O(n_rays) job; TPU-first means not inheriting that. Sampling
        # is with replacement (collisions are ~0.3% of a 2048-ray batch at
        # 800x800 and statistically immaterial to SGD).
        idx = jax.random.randint(k_sel, (cfg.train.n_rays,), 0, H * W)
        i = (idx % W).astype(jnp.float32)
        j = (idx // W).astype(jnp.float32)
        dirs_cam = jnp.stack(
            [(i - W * 0.5) / focal, -(j - H * 0.5) / focal,
             -jnp.ones_like(i)],
            axis=-1,
        )
        rays_d = dirs_cam @ pose[:3, :3].T
        rays_o = jnp.broadcast_to(pose[:3, -1], rays_d.shape)
        target = jnp.take(image.reshape(-1, 3), idx, axis=0)
        if ray_sharding is not None:
            rays_o = jax.lax.with_sharding_constraint(rays_o, ray_sharding)
            rays_d = jax.lax.with_sharding_constraint(rays_d, ray_sharding)
            target = jax.lax.with_sharding_constraint(target, ray_sharding)

        (loss, (loss_c, loss_f)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, rays_o, rays_d, target, k_render)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {
            "loss": loss,
            "loss_coarse": loss_c,
            "loss_fine": loss_f,
            "psnr": psnr_from_mse(loss_f),
        }
        return new_state, metrics

    if not jit:
        return step_fn
    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_multi_train_step(cfg: Config, img_hw: Tuple[int, int], n_inner: int,
                          apply_fn=apply_nerf, donate: bool = True,
                          ray_sharding=None):
    """``lax.scan`` ``n_inner`` train steps into ONE device dispatch:
    ``fn(state, images [K,H,W,3], poses [K,4,4], focal, key) -> (state,
    stacked metrics)``. Amortizes the per-dispatch launch floor (~3.7 ms
    measured over the remote-TPU tunnel) that dominates once the step body
    is kernel-bound; the semantics are exactly ``n_inner`` sequential calls
    of ``make_train_step``'s step (one image per step, as the reference's
    per-image batches, ``trainer.py:83-136``)."""
    inner = make_train_step(cfg, img_hw, apply_fn=apply_fn, donate=False,
                            ray_sharding=ray_sharding, jit=False)

    def multi_step(state: TrainState, images, poses, focal, key):
        keys = jax.random.split(key, images.shape[0])

        def body(st, xs):
            img, pose, k = xs
            st, metrics = inner(st, img, pose, focal, k)
            return st, metrics

        return jax.lax.scan(body, state, (images, poses, keys))

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi_step, donate_argnums=donate_argnums)


def make_ray_train_step(cfg: Config, apply_fn=apply_nerf, donate: bool = True,
                        ray_sharding=None):
    """Train step over pre-assembled ray batches: ``step_fn(state,
    rays_o [R,3], rays_d [R,3], target [R,3], key) -> (state, metrics)``.

    The streaming twin of ``make_train_step``: ray selection happens on the
    host (the native producer, ``runtime.RayBatchSampler``) instead of
    on-device — the right split when images are too many to keep in HBM or
    when a CPU host feeds multiple chips.
    """
    optimizer = make_optimizer(cfg)
    dt = jnp.dtype(cfg.train.compute_dtype)

    def loss_fn(params, rays_o, rays_d, target, key):
        result = render_rays(
            params["coarse"], params["fine"], rays_o, rays_d,
            cfg.model, cfg.render, key=key,
            perturb=cfg.render.perturb, compute_dtype=dt, apply_fn=apply_fn,
        )
        loss_c = jnp.mean((result.coarse.rgb - target) ** 2)
        loss_f = jnp.mean((result.fine.rgb - target) ** 2)
        return loss_c + loss_f, (loss_c, loss_f)

    def step_fn(state: TrainState, rays_o, rays_d, target, key):
        if ray_sharding is not None:
            rays_o = jax.lax.with_sharding_constraint(rays_o, ray_sharding)
            rays_d = jax.lax.with_sharding_constraint(rays_d, ray_sharding)
            target = jax.lax.with_sharding_constraint(target, ray_sharding)
        (loss, (loss_c, loss_f)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, rays_o, rays_d, target, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        metrics = {
            "loss": loss,
            "loss_coarse": loss_c,
            "loss_fine": loss_f,
            "psnr": psnr_from_mse(loss_f),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_eval_render(cfg: Config, n_rays_chunk: int, apply_fn=apply_nerf):
    """Jitted chunk renderer for validation / full-image rendering: fixed
    chunk shape (callers pad), deterministic sampling, fine output only."""
    dt = jnp.dtype(cfg.train.compute_dtype)

    @jax.jit
    def render_chunk(params, rays_o, rays_d):
        result = render_rays(
            params["coarse"], params["fine"], rays_o, rays_d,
            cfg.model, cfg.render, key=None, perturb=False,
            compute_dtype=dt, apply_fn=apply_fn,
        )
        return result.fine.rgb, result.fine.depth

    def render_image(params, pose, img_hw, focal):
        H, W = img_hw
        rays_o, rays_d = generate_rays(jnp.asarray(pose), W, H, focal)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        n = H * W
        pad = (-n) % n_rays_chunk
        if pad:
            rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], axis=0)
            rays_d = jnp.concatenate([rays_d, jnp.ones((pad, 3))], axis=0)
        rgbs, depths = [], []
        for i in range(0, n + pad, n_rays_chunk):
            rgb, depth = render_chunk(
                params, rays_o[i : i + n_rays_chunk], rays_d[i : i + n_rays_chunk]
            )
            rgbs.append(rgb)
            depths.append(depth)
        rgb = jnp.concatenate(rgbs)[:n].reshape(H, W, 3)
        depth = jnp.concatenate(depths)[:n].reshape(H, W)
        return rgb, depth

    return render_image


def default_train_apply_fn(cfg: Config):
    """The MLP evaluator the trainer uses by default: the fused Pallas
    forward+backward kernels (``ops/train_kernel.py``) when on TPU with the
    architecture they specialize; the XLA path otherwise. Measured on v5e at
    the reference recipe (800x800, 2048 rays, 64+128 importance): 43.7 ms ->
    28.3 ms/step."""
    mcfg = cfg.model
    on_tpu = jax.devices()[0].platform == "tpu"
    standard = (mcfg.variant == "reference" and mcfg.hidden_dim == 256
                and mcfg.n_layers == 8 and mcfg.color_hidden_dim == 128)
    if on_tpu and standard:
        from nerf_tpu.ops.train_kernel import make_train_apply_fn

        return make_train_apply_fn(block=1024)
    return apply_nerf


class NeRFTrainer:
    """Training orchestration: epochs, validation, checkpoints, resume,
    loss curves. All compute lives in the jitted step above."""

    def __init__(self, cfg: Config, img_hw: Tuple[int, int], apply_fn=None):
        self.cfg = cfg
        self.img_hw = img_hw
        self.apply_fn = apply_fn if apply_fn is not None else default_train_apply_fn(cfg)
        apply_fn = self.apply_fn
        self.key = jax.random.PRNGKey(cfg.train.seed)
        self.key, init_key = jax.random.split(self.key)
        self.state = init_train_state(init_key, cfg)
        self.step_fn = make_train_step(cfg, img_hw, apply_fn)
        self.render_image = make_eval_render(cfg, n_rays_chunk=4096, apply_fn=apply_fn)
        self.train_losses: List[float] = []
        self.val_losses: List[float] = []
        self._device_ds_cache: Dict[int, Any] = {}
        self._multi_step_cache: Dict[int, Any] = {}

    def _multi_step_fn(self, k: int):
        fn = self._multi_step_cache.get(k)
        if fn is None:
            fn = make_multi_train_step(self.cfg, self.img_hw, k, self.apply_fn)
            self._multi_step_cache[k] = fn
        return fn

    # -- checkpointing ------------------------------------------------------

    def save_checkpoint(self, name: str) -> str:
        path = os.path.join(self.cfg.checkpoint_dir, name)
        if not path.endswith(".npz"):
            path += ".npz"
        meta = {
            "config": self.cfg.to_dict(),
            "train_losses": self.train_losses,
            "val_losses": self.val_losses,
            "step": int(self.state.step),
        }
        ckpt.save_checkpoint(path, self.state, meta)
        return path

    def load_checkpoint(self, path: str) -> None:
        self.state, meta = ckpt.restore_checkpoint(path, self.state)
        self.train_losses = list(meta.get("train_losses", []))
        self.val_losses = list(meta.get("val_losses", []))

    def try_resume(self) -> Optional[str]:
        """Resume from the newest readable checkpoint. A corrupt/truncated
        file (e.g. preemption mid-write on a non-atomic filesystem) is
        skipped and the next-newest is tried — elastic recovery the
        reference lacks (its resume hard-fails on a bad file,
        ``trainer.py:184-204``)."""
        tried = set()
        while True:
            latest = ckpt.find_latest_checkpoint(
                self.cfg.checkpoint_dir, exclude=tried
            )
            if latest is None:
                return None
            try:
                self.load_checkpoint(latest)
                return latest
            except Exception as e:
                print(f"checkpoint {latest} unreadable ({e}); trying older")
                tried.add(latest)

    # -- loops --------------------------------------------------------------

    def _device_dataset(self, dataset):
        """Images/poses as stacked device-resident jax arrays ([N,H,W,3] /
        [N,4,4]), uploaded once — the per-step host->device image transfer
        (7.7 MB at 800x800) would otherwise dominate an O(n_rays) step."""
        key = id(dataset)
        cached = self._device_ds_cache.get(key)
        if cached is None or cached[0].shape[0] != len(dataset):
            items = [dataset[i] for i in range(len(dataset))]
            cached = (
                jax.device_put(jnp.stack(
                    [jnp.asarray(it["image"]) for it in items])),
                jax.device_put(jnp.stack(
                    [jnp.asarray(it["pose"]) for it in items])),
            )
            self._device_ds_cache = {key: cached}
        return cached

    def train_epoch(self, dataset, inner: Optional[int] = None) -> float:
        """One pass over the dataset — semantically one step per image (the
        reference's 'batch' = one image's random ray subset,
        ``trainer.py:83-136``), dispatched as ``lax.scan`` chunks of
        ``inner`` images (default 10) so the ~3.7 ms per-dispatch launch
        floor of a tunneled backend amortizes across steps. The scan body is
        exactly ``make_train_step``'s step; numerics are the per-step path's
        (tested in ``tests/test_train.py``)."""
        focal = jnp.float32(dataset.focal)
        images, poses = self._device_dataset(dataset)
        n = images.shape[0]
        inner = min(inner if inner is not None else 10, n)
        losses = []
        i = 0
        while i < n:
            k_chunk = min(inner, n - i)
            self.key, k = jax.random.split(self.key)
            if k_chunk == 1:
                self.state, metrics = self.step_fn(
                    self.state, images[i], poses[i], focal, k
                )
                losses.append(metrics["loss"])
            else:
                fn = self._multi_step_fn(k_chunk)
                self.state, metrics = fn(
                    self.state, images[i : i + k_chunk],
                    poses[i : i + k_chunk], focal, k,
                )
                losses.append(jnp.mean(metrics["loss"]))
            i += k_chunk
        # one host sync per epoch, not per step
        return float(jnp.mean(jnp.stack(losses)))

    def train_streaming(self, dataset, n_steps: int, log_every: int = 100,
                        log_fn=print) -> float:
        """Train from the native background ray producer (C++ runtime):
        shuffled ray batches are pre-assembled on a host thread while the
        device runs the previous step. Returns the final loss."""
        from nerf_tpu.runtime import RayBatchSampler

        step_fn = make_ray_train_step(self.cfg, self.apply_fn)
        last = float("nan")
        with RayBatchSampler(
            dataset.images, dataset.poses, dataset.focal,
            n_rays=self.cfg.train.n_rays, seed=self.cfg.train.seed,
        ) as sampler:
            for i in range(n_steps):
                rays_o, rays_d, rgb = sampler.next_batch()
                self.key, k = jax.random.split(self.key)
                self.state, metrics = step_fn(
                    self.state, jnp.asarray(rays_o), jnp.asarray(rays_d),
                    jnp.asarray(rgb), k,
                )
                if (i + 1) % log_every == 0:
                    last = float(metrics["loss"])
                    log_fn(f"step {i + 1}/{n_steps} loss={last:.6f}")
        if last != last:  # no log point hit: sync once at the end
            last = float(metrics["loss"])
        self.train_losses.append(last)
        return last

    def validate(self, dataset) -> float:
        n = min(len(dataset), self.cfg.train.max_val_images)
        mses = []
        for i in range(n):
            item = dataset[i]
            rgb, _ = self.render_image(
                self.state.params, item["pose"], self.img_hw, float(dataset.focal)
            )
            mses.append(float(jnp.mean((rgb - jnp.asarray(item["image"])) ** 2)))
        return float(np.mean(mses)) if mses else float("nan")

    def train(self, train_ds, val_ds=None, n_epochs: Optional[int] = None,
              resume: bool = True, log_fn=print) -> None:
        n_epochs = n_epochs if n_epochs is not None else self.cfg.train.n_epochs
        start_epoch = 0
        if resume:
            latest = self.try_resume()
            if latest:
                start_epoch = len(self.train_losses)
                log_fn(f"resumed from {latest} at epoch {start_epoch}")

        for epoch in range(start_epoch, n_epochs):
            t0 = time.perf_counter()
            loss = self.train_epoch(train_ds)
            self.train_losses.append(loss)
            dt = time.perf_counter() - t0
            msg = f"epoch {epoch + 1}/{n_epochs} loss={loss:.6f} ({dt:.2f}s)"

            if val_ds is not None and (epoch + 1) % self.cfg.train.val_frequency == 0:
                val_mse = self.validate(val_ds)
                self.val_losses.append(val_mse)
                msg += f" val_mse={val_mse:.6f} val_psnr={10*np.log10(1.0/max(val_mse,1e-12)):.2f}dB"

            log_fn(msg)
            if (epoch + 1) % self.cfg.train.checkpoint_frequency == 0:
                path = self.save_checkpoint(f"checkpoint_epoch_{epoch + 1}.npz")
                log_fn(f"saved {path}")

    def plot_losses(self, out_path: Optional[str] = None) -> Optional[str]:
        """Loss-curve PNG (reference ``trainer.py:404-423``)."""
        if not self.train_losses:
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        out_path = out_path or os.path.join(self.cfg.output_dir, "training_losses.png")
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(self.train_losses, label="train loss")
        if self.val_losses:
            xs = np.linspace(0, len(self.train_losses), len(self.val_losses) + 1)[1:]
            ax.plot(xs, self.val_losses, "o-", label="val mse")
        ax.set_xlabel("epoch")
        ax.set_ylabel("MSE")
        ax.set_yscale("log")
        ax.legend()
        ax.set_title("NeRF training")
        fig.tight_layout()
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
