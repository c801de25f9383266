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
from sunet_tf_tpu.ops.image import (
    add_awgn,
    dihedral_batch,
    psnr,
    psnr_per_sample,
    rgb_to_gray,
    ssim_per_sample,
)
from sunet_tf_tpu.ops.metrics import DEFAULT_BINS, init_histograms, update_histograms
from sunet_tf_tpu.ops.morphology import boundary_ring_weights
from sunet_tf_tpu.train.losses import (
    charbonnier_loss,
    charbonnier_per_sample,
    mse_loss,
    mse_per_sample,
)


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
    (reference train.py:126-135). The update is HBM-roofline-bound, so
    moment STORAGE dtypes are throughput knobs (arithmetic stays fp32):
    TPU.OPT_MU_DTYPE (default bf16, +3.6% train step on v5e) and
    TPU.OPT_NU_DTYPE (default bf16 + stochastic rounding — nu's
    0.999-EMA increments are sub-ulp in bf16, SR keeps the EMA unbiased;
    +0.8% same-day A/B). "float32" for both restores the bit-exact
    reference optimizer."""
    mu_dtype = {"float32": None, "bfloat16": jnp.bfloat16}[
        getattr(cfg.tpu, "opt_mu_dtype", "bfloat16")]
    nu_choice = getattr(cfg.tpu, "opt_nu_dtype", "float32")
    if nu_choice not in ("float32", "bfloat16", "bfloat16_sr"):
        raise ValueError(
            f"TPU.OPT_NU_DTYPE must be one of float32|bfloat16|bfloat16_sr, "
            f"got {nu_choice!r}")
    if nu_choice != "float32":
        # bf16 nu needs stochastic rounding to stay unbiased (its
        # 0.999-EMA increments round away deterministically) — see
        # train/adam.py. Same chained state tree as optax.adam, so
        # checkpoints interchange across every dtype choice.
        from sunet_tf_tpu.train.adam import adam_lp

        return adam_lp(
            learning_rate=make_optax_lr_schedule(cfg, steps_per_epoch),
            b1=cfg.optim.beta1,
            b2=cfg.optim.beta2,
            eps=cfg.optim.eps,
            mu_dtype=mu_dtype,
            nu_dtype=jnp.bfloat16,
            stochastic_round_nu=(nu_choice == "bfloat16_sr"),
            sr_seed=cfg.training.seed,
        )
    return optax.adam(
        learning_rate=make_optax_lr_schedule(cfg, steps_per_epoch),
        b1=cfg.optim.beta1,
        b2=cfg.optim.beta2,
        eps=cfg.optim.eps,
        mu_dtype=mu_dtype,
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
    constrain=None,
    mesh=None,
    stage_runner=None,
) -> TrainStepFns:
    """Build jitted-ready pure step functions over nnx (graphdef, params).

    constrain: optional activation-sharding hook threaded into the model
    (parallel.spatial.spatial_constrainer) — TPU.SPATIAL > 1 shards
    activation H over the 'spatial' mesh axis inside the same step.

    mesh: when given with data > 1 and the Pallas attention backend, the
    model apply is wrapped in shard_map over 'data' so the fused kernels
    partition per-shard (batch-sharded kernels are embarrassingly
    parallel — no cross-shard data flows through a Swin block). GSPMD
    cannot partition a Mosaic custom call, so without this wrapper a
    multi-chip mesh would replicate the kernels' inputs; with it,
    multi-chip data parallelism keeps the single-chip kernel advantage
    (~4x vs the XLA attention path on v5e). Autodiff flows through
    shard_map (the replicated-params cotangent psum IS the gradient
    all-reduce); grad parity vs the unsharded step is fp32
    reduction-order noise (tests/test_parallel_pallas.py).
    """
    assert task in ("denoise", "mask")

    backend = cfg.tpu.attention_backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    use_smap = (mesh is not None and backend == "pallas"
                and mesh.shape.get("data", 1) > 1
                and mesh.shape.get("spatial", 1) == 1 and constrain is None)

    if use_smap:
        from jax import shard_map as _shard_map
        from jax.sharding import PartitionSpec as _P

        def forward(params, x, key=None):
            # check_vma=False: pallas_call outputs carry no vma
            # annotation; transposition still psums the replicated
            # params' cotangent (verified against the unsharded grad).
            if key is None:
                return _shard_map(
                    lambda p, xl: nnx.merge(graphdef, p)(xl),
                    mesh=mesh, in_specs=(_P(), _P("data")),
                    out_specs=_P("data"), check_vma=False)(params, x)

            def local_k(p, xl, k):
                # decorrelate dropout/drop-path across shards; when all
                # drop rates are 0 (the reference recipe) this is inert
                k = jax.random.fold_in(k, jax.lax.axis_index("data"))
                return nnx.merge(graphdef, p)(xl, key=k)

            return _shard_map(
                local_k, mesh=mesh, in_specs=(_P(), _P("data"), _P()),
                out_specs=_P("data"), check_vma=False)(params, x, key)
    else:
        def forward(params, x, key=None):
            model = nnx.merge(graphdef, params)
            return model(x, key=key, constrain=constrain,
                         stage_runner=stage_runner)

    def prepare(batch, key):
        """uint8 batch dict -> float input/target with on-device aug/noise.

        Dihedral aug runs on the uint8 arrays BEFORE normalization (the
        transforms are pure index remaps, so they commute with the
        pointwise /255 exactly) — 4x less relayout bandwidth than
        flipping fp32, and for the denoise task XLA dead-code-eliminates
        the untouched input branch entirely.
        """
        inp, tar = batch["input"], batch["target"]
        if augment:
            kaug, key = jax.random.split(key)
            ops = jax.random.randint(kaug, (inp.shape[0],), 0, 9)
            inp = dihedral_batch(inp, ops)
            tar = dihedral_batch(tar, ops)
        inp = _normalize(inp)
        tar = _normalize(tar)
        if task == "denoise":
            knoise, key = jax.random.split(key)
            # input channel is the clean image; synthesize noisy on device
            inp = jnp.clip(add_awgn(knoise, tar, sigma), 0.0, 1.0)
        else:
            tar = _prep_mask_target(tar)
        return inp, tar, key

    def loss_and_metrics(params, inp, tar, key, v):
        """v: (B,) 0/1 valid mask — batch_iterator pads trailing partial
        batches by wrapping to the epoch's first samples so the batch
        divides the data mesh axis; without masking, those duplicated
        rows would contribute to the loss and gradients unweighted
        (round-2 advisor finding). The Σ(l·w)/Σw normalization makes the
        masked loss exactly the mean over valid samples."""
        logits = forward(params, inp, key)
        v4 = v[:, None, None, None]
        if task == "denoise":
            weights = None
            loss = charbonnier_loss(logits, tar, v4)
        else:
            weights = boundary_ring_weights(tar)
            loss = charbonnier_loss(logits, tar, weights * v4)
        return loss, (logits, weights)

    def train_step(params, opt_state, batch, rng, step_idx, hists):
        """One optimizer step. Returns (params, opt_state, scalars, hists).

        For the mask task, sigmoid scores/labels stream into the pos/neg
        histograms on device — the TPU-native replacement for the
        reference's capped train-split pixel collection + host sync
        (train.py:347-364; we accumulate ALL pixels, strictly more data
        than its 200k-pixel subsample)."""
        key = jax.random.fold_in(rng, step_idx)
        inp, tar, key = prepare(batch, key)
        v = batch.get("valid")
        v = (jnp.ones((inp.shape[0],), jnp.float32) if v is None
             else v.astype(jnp.float32))
        kmodel, _ = jax.random.split(key)
        (loss, (logits, weights)), grads = jax.value_and_grad(
            loss_and_metrics, has_aux=True)(params, inp, tar, kmodel, v)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        v4 = v[:, None, None, None]
        scalars = {"loss": loss}
        if task == "denoise":
            scalars["psnr"] = psnr(tar, jnp.clip(logits, 0.0, 1.0))
            scalars["mse"] = mse_loss(logits, tar, v4)
        else:
            scalars["mse"] = mse_loss(logits, tar, v4)
            scalars["mse_w"] = mse_loss(logits, tar, weights * v4)
            hists = update_histograms(hists, jax.nn.sigmoid(logits),
                                      (tar > 0.5).astype(jnp.float32),
                                      sample_weight=v)
        return params, opt_state, scalars, hists

    def init_metrics():
        if task == "mask":
            return init_histograms(DEFAULT_BINS)
        return {}

    def eval_step(params, batch, hists):
        """Deterministic eval; accumulates streaming metric state on device.

        Returns per-sample metric SUMS plus the valid-sample count "n"
        (the caller divides) so results are exact regardless of batch size,
        sharding, or padding: the reference evaluates at batch 1
        (train.py:158) and this reproduces that protocol at any batch.
        batch may carry a "valid" (B,) 0/1 mask marking padded rows.
        """
        inp = _normalize(batch["input"])
        tar = _normalize(batch["target"])
        v = batch.get("valid")
        v = (jnp.ones((inp.shape[0],), jnp.float32) if v is None
             else v.astype(jnp.float32))
        if task == "denoise":
            logits = forward(params, inp)
            pred = jnp.clip(logits, 0.0, 1.0)
            # SSIM on grayscale, the evaluation.m protocol
            tg = rgb_to_gray(tar) if tar.shape[-1] == 3 else tar
            pg = rgb_to_gray(pred) if pred.shape[-1] == 3 else pred
            sums = {
                "loss": jnp.sum(charbonnier_per_sample(logits, tar) * v),
                "mse": jnp.sum(mse_per_sample(logits, tar) * v),
                "psnr": jnp.sum(psnr_per_sample(tar, pred) * v),
                "ssim": jnp.sum(ssim_per_sample(tg, pg) * v),
                "n": jnp.sum(v),
            }
            return sums, hists
        tar = _prep_mask_target(tar)
        logits = forward(params, inp)
        weights = boundary_ring_weights(tar)
        prob = jax.nn.sigmoid(logits)
        sums = {
            "loss": jnp.sum(charbonnier_per_sample(logits, tar, weights) * v),
            "mse": jnp.sum(mse_per_sample(logits, tar) * v),
            "mse_w": jnp.sum(mse_per_sample(logits, tar, weights) * v),
            "n": jnp.sum(v),
        }
        hists = update_histograms(hists, prob, (tar > 0.5).astype(jnp.float32),
                                  sample_weight=v)
        return sums, hists

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
        # `dat` is a pytree PREFIX for the batch dict: every leaf (input,
        # target, optional valid mask) is batch-leading.
        kwargs_train["in_shardings"] = (rep, rep, dat, rep, rep, rep)
        kwargs_train["out_shardings"] = (rep, rep, rep, rep)
        # eval batches are padded to a 'data' multiple by batch_iterator
        # (pad rows masked by "valid"), so eval shards over the mesh too —
        # the reference's batch-1 serialized eval (train.py:158) was a
        # self-inflicted bottleneck on a multi-chip mesh.
        kwargs_eval["in_shardings"] = (rep, dat, rep)
        kwargs_eval["out_shardings"] = (rep, rep)
    train = jax.jit(
        fns.train_step,
        donate_argnums=(0, 1, 5) if donate else (),
        **kwargs_train,
    )
    ev = jax.jit(fns.eval_step, donate_argnums=(2,) if donate else (), **kwargs_eval)
    return TrainStepFns(train_step=train, eval_step=ev, init_metrics=fns.init_metrics)
