"""Functional training/eval steps: jitted, donated, mesh-sharded.

One compiled program per (task, shape): the whole hot path — normalization,
augmentation, AWGN synthesis, boundary weights, forward, loss, backward,
Adam update, metrics — runs on device. The reference's per-batch host syncs
(weight computation train.py:226-249, metric collection :347-364) are gone;
per-epoch scalars cross to the host once.

Tasks (the two reference workload personalities, SURVEY §0):

- ``denoise``: input = clean + on-device AWGN(sigma); target = clean RGB;
  unweighted Charbonnier; PSNR tracked.
- ``mask``: input as loaded; target = Rec.601 gray of the target image;
  boundary-ring-weighted Charbonnier on raw logits (reference train.py:
  328-344); MSE / weighted-MSE / streaming AUROC-AUPRC histograms tracked.

Batches arrive as uint8 NHWC (4x less host->device traffic); normalization
to [0,1] happens on device. Dihedral augmentation (dataset_RGB.py:63-84)
runs on device with per-sample ops drawn from the step RNG.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from sunet_tf_tpu.config import Config
from sunet_tf_tpu.ops.image import add_awgn, dihedral_batch, psnr, rgb_to_gray
from sunet_tf_tpu.ops.metrics import DEFAULT_BINS, init_histograms, update_histograms
from sunet_tf_tpu.ops.morphology import boundary_ring_weights
from sunet_tf_tpu.train.losses import charbonnier_loss, mse_loss


def make_optax_lr_schedule(cfg: Config, steps_per_epoch: int) -> Callable:
    """jnp closed form of the reference LR sequence (see train/schedule.py);
    LR is a function of the optax step count, constant within an epoch."""
    base = cfg.optim.lr_initial
    lr_min = cfg.optim.lr_min
    warm = cfg.optim.warmup_epochs
    t_max = max(cfg.optim.epochs - warm, 1)

    def sched(count):
        epoch = count // max(steps_per_epoch, 1) + 1
        ramp = base * epoch.astype(jnp.float32) / warm
        cos_step = (epoch - warm - 1).astype(jnp.float32)
        cos = lr_min + (base - lr_min) * (1.0 + jnp.cos(jnp.pi * cos_step / t_max)) / 2.0
        return jnp.where(epoch <= warm, ramp, cos).astype(jnp.float32)

    return sched


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam(0.9, 0.999, eps=1e-8) under the reference LR schedule
    (reference train.py:126-135)."""
    return optax.adam(
        learning_rate=make_optax_lr_schedule(cfg, steps_per_epoch),
        b1=cfg.optim.beta1,
        b2=cfg.optim.beta2,
        eps=cfg.optim.eps,
    )


@dataclasses.dataclass
class TrainStepFns:
    train_step: Callable
    eval_step: Callable
    init_metrics: Callable


def _normalize(batch_u8):
    return batch_u8.astype(jnp.float32) / 255.0


def _prep_mask_target(target):
    """RGB mask targets -> single gray channel (reference train.py:328-329)."""
    if target.shape[-1] == 3:
        return rgb_to_gray(target)
    return target


def build_steps(
    cfg: Config,
    graphdef,
    tx: optax.GradientTransformation,
    task: str = "denoise",
    sigma: float = 50.0,
    augment: bool = True,
) -> TrainStepFns:
    """Build jitted-ready pure step functions over nnx (graphdef, params)."""
    assert task in ("denoise", "mask")

    def forward(params, x, key=None):
        model = nnx.merge(graphdef, params)
        return model(x, key=key)

    def prepare(batch, key):
        """uint8 batch dict -> float input/target with on-device aug/noise."""
        inp = _normalize(batch["input"])
        tar = _normalize(batch["target"])
        if augment:
            kaug, key = jax.random.split(key)
            ops = jax.random.randint(kaug, (inp.shape[0],), 0, 9)
            inp = dihedral_batch(inp, ops)
            tar = dihedral_batch(tar, ops)
        if task == "denoise":
            knoise, key = jax.random.split(key)
            # input channel is the clean image; synthesize noisy on device
            inp = jnp.clip(add_awgn(knoise, tar, sigma), 0.0, 1.0)
        else:
            tar = _prep_mask_target(tar)
        return inp, tar, key

    def loss_and_metrics(params, inp, tar, key):
        logits = forward(params, inp, key)
        if task == "denoise":
            loss = charbonnier_loss(logits, tar)
            weights = None
        else:
            weights = boundary_ring_weights(tar)
            loss = charbonnier_loss(logits, tar, weights)
        return loss, (logits, weights)

    def train_step(params, opt_state, batch, rng, step_idx):
        """One optimizer step. Returns (params, opt_state, scalars)."""
        key = jax.random.fold_in(rng, step_idx)
        inp, tar, key = prepare(batch, key)
        kmodel, _ = jax.random.split(key)
        (loss, (logits, weights)), grads = jax.value_and_grad(
            loss_and_metrics, has_aux=True)(params, inp, tar, kmodel)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        scalars = {"loss": loss}
        if task == "denoise":
            scalars["psnr"] = psnr(tar, jnp.clip(logits, 0.0, 1.0))
            scalars["mse"] = mse_loss(logits, tar)
        else:
            scalars["mse"] = mse_loss(logits, tar)
            scalars["mse_w"] = mse_loss(logits, tar, weights)
        return params, opt_state, scalars

    def init_metrics():
        if task == "mask":
            return init_histograms(DEFAULT_BINS)
        return {}

    def eval_step(params, batch, hists):
        """Deterministic eval; accumulates streaming metric state on device."""
        inp = _normalize(batch["input"])
        tar = _normalize(batch["target"])
        if task == "denoise":
            from sunet_tf_tpu.ops.image import rgb_to_gray, ssim

            logits = forward(params, inp)
            pred = jnp.clip(logits, 0.0, 1.0)
            scalars = {
                "loss": charbonnier_loss(logits, tar),
                "mse": mse_loss(logits, tar),
                "psnr": psnr(tar, pred),
                # SSIM on grayscale, the evaluation.m protocol
                "ssim": ssim(rgb_to_gray(tar) if tar.shape[-1] == 3 else tar,
                             rgb_to_gray(pred) if pred.shape[-1] == 3 else pred),
            }
            return scalars, hists
        tar = _prep_mask_target(tar)
        logits = forward(params, inp)
        weights = boundary_ring_weights(tar)
        prob = jax.nn.sigmoid(logits)
        scalars = {
            "loss": charbonnier_loss(logits, tar, weights),
            "mse": mse_loss(logits, tar),
            "mse_w": mse_loss(logits, tar, weights),
        }
        hists = update_histograms(hists, prob, (tar > 0.5).astype(jnp.float32))
        return scalars, hists

    return TrainStepFns(train_step=train_step, eval_step=eval_step,
                        init_metrics=init_metrics)


def jit_steps(
    fns: TrainStepFns,
    mesh=None,
    donate: bool = True,
) -> TrainStepFns:
    """jit the steps; with a mesh, shard the batch over 'data' and replicate
    params/opt state (XLA inserts the gradient psum over ICI)."""
    kwargs_train: dict = {}
    kwargs_eval: dict = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        dat = NamedSharding(mesh, P("data"))
        batch_shard = {"input": dat, "target": dat}
        kwargs_train["in_shardings"] = (rep, rep, batch_shard, rep, rep)
        kwargs_train["out_shardings"] = (rep, rep, rep)
        # eval batches are small (reference uses batch 1, train.py:158) and
        # may not divide the mesh — keep them replicated.
        kwargs_eval["in_shardings"] = (rep, rep, rep)
        kwargs_eval["out_shardings"] = (rep, rep)
    train = jax.jit(
        fns.train_step,
        donate_argnums=(0, 1) if donate else (),
        **kwargs_train,
    )
    ev = jax.jit(fns.eval_step, donate_argnums=(2,) if donate else (), **kwargs_eval)
    return TrainStepFns(train_step=train, eval_step=ev, init_metrics=fns.init_metrics)
