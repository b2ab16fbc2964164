"""img_fit training loop (the CPU-runnable minimum end-to-end slice).

Parity: reference img_fit pipeline (configs/img_fit/lego_view0.yaml):
uv batch -> freq-encode -> 4x128 MLP -> sigmoid rgb; loss = MSE + PSNR
(the reference's ``src.train.losses.img_fit`` module is missing — this is
the intended behavior, SURVEY.md §3.5).
"""
from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.img_fit import ImgFitDataset
from ..models.img_fit import apply_img_fit_mlp, init_img_fit_mlp
from .checkpoint import load_checkpoint, save_checkpoint
from .optim import make_optimizer
from .state import TrainState, init_state


@partial(jax.jit, static_argnames=("tx", "num_freqs", "n_pixels"), donate_argnames=("state",))
def img_fit_step(state, uv_all, rgb_all, key, tx, num_freqs, n_pixels):
    k = jax.random.fold_in(key, state.step)
    idx = jax.random.randint(k, (n_pixels,), 0, uv_all.shape[0])
    uv, target = uv_all[idx], rgb_all[idx]

    def loss_fn(p):
        pred = apply_img_fit_mlp(p, uv, num_freqs=num_freqs)
        mse = jnp.mean((pred - target) ** 2)
        return mse, {"loss": mse, "psnr": -10.0 * jnp.log10(mse)}

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), stats


def train_img_fit(cfg, max_epochs=None):
    net = cfg.network
    num_freqs = int(net.get("uv_encoder", {}).get("freq", 10))
    D = int(net.get("mlp", {}).get("D", 4))
    W = int(net.get("mlp", {}).get("W", 128))
    n_pixels = int(cfg.train_dataset.get("N_pixels", 8192))

    ds = ImgFitDataset(
        data_root=cfg.train_dataset.data_root,
        scene=cfg.get("scene", "lego"),
        view=int(cfg.train_dataset.get("view", 0)),
        input_ratio=float(cfg.train_dataset.get("input_ratio", 1.0)),
        n_pixels=n_pixels,
    )
    uv_all = jnp.asarray(ds.uv)
    rgb_all = jnp.asarray(ds.rgb)

    key = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    params = init_img_fit_mlp(key, D=D, W=W, num_freqs=num_freqs)
    tx = make_optimizer(cfg)
    state = init_state(params, tx)

    model_dir = cfg.trained_model_dir
    begin_epoch = 0
    ckpt = load_checkpoint(model_dir, state)
    if ckpt is not None and cfg.get("resume", True):
        state, begin_epoch, _ = ckpt
        begin_epoch += 1

    ep_iter = int(cfg.get("ep_iter", 100))
    end_epoch = int(cfg.train.epoch) if max_epochs is None else begin_epoch + max_epochs
    for epoch in range(begin_epoch, end_epoch):
        t0 = time.time()
        for _ in range(ep_iter):
            state, stats = img_fit_step(
                state, uv_all, rgb_all, key, tx, num_freqs, n_pixels
            )
        stats = {k2: float(v) for k2, v in stats.items()}
        print(
            f"epoch {epoch}  loss: {stats['loss']:.5f}  psnr: {stats['psnr']:.2f}"
            f"  ({time.time() - t0:.2f}s)"
        )
        if (epoch + 1) % int(cfg.get("save_latest_ep", 10)) == 0:
            save_checkpoint(model_dir, state, epoch)
    save_checkpoint(model_dir, state, end_epoch - 1)
    return state, ds


def eval_img_fit(cfg, state=None, ds=None):
    """Full-image prediction + PSNR + gt|pred jpg (evaluators/img_fit.py)."""
    from ..eval.metrics import psnr as psnr_fn

    if ds is None:
        ds = ImgFitDataset(
            data_root=cfg.train_dataset.data_root,
            scene=cfg.get("scene", "lego"),
            view=int(cfg.train_dataset.get("view", 0)),
            input_ratio=float(cfg.train_dataset.get("input_ratio", 1.0)),
        )
    num_freqs = int(cfg.network.get("uv_encoder", {}).get("freq", 10))
    if state is None:
        D = int(cfg.network.get("mlp", {}).get("D", 4))
        W = int(cfg.network.get("mlp", {}).get("W", 128))
        params = init_img_fit_mlp(jax.random.PRNGKey(0), D=D, W=W, num_freqs=num_freqs)
        tx = make_optimizer(cfg)
        template = init_state(params, tx)
        ckpt = load_checkpoint(cfg.trained_model_dir, template)
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint in {cfg.trained_model_dir}")
        state = ckpt[0]

    pred = np.asarray(
        apply_img_fit_mlp(state.params, jnp.asarray(ds.uv), num_freqs=num_freqs)
    ).reshape(ds.H, ds.W, 3)
    p = psnr_fn(np.clip(pred, 0, 1), ds.image)
    print(f"img_fit eval PSNR: {p:.2f}")

    result_dir = cfg.result_dir
    os.makedirs(result_dir, exist_ok=True)
    import imageio.v2 as imageio
    import json

    concat = np.concatenate([ds.image, np.clip(pred, 0, 1)], axis=1)
    imageio.imwrite(
        os.path.join(result_dir, "gt_pred.jpg"),
        (concat * 255).astype(np.uint8),
    )
    with open(os.path.join(result_dir, "metrics.json"), "w") as f:
        json.dump({"psnr": float(p)}, f)
    return p
