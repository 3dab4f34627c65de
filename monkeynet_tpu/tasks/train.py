"""GAN training: the whole iteration is ONE jitted XLA program.

The reference's per-iteration Python orchestration (train.py:108-143: G
forward, backward with retain_graph, three optimizer steps staged across two
backward passes) collapses into a single `train_step` built around one scalar
objective whose stop_gradient placement reproduces the reference's exact
gradient routing:

  * generator params   <- dL_G/dG                        (train.py:117-118)
  * discriminator      <- dL_D/dD   (L_G grads discarded; we never take them
                          by evaluating L_G's discriminator with
                          stop_gradient'd D params)       (train.py:131-132)
  * kp detector        <- dL_G/dKP            if detach_kp_discriminator
                          d(L_G + L_D)/dKP    otherwise   (train.py:121-136)
  * detach_kp_generator / detach_kp_discriminator map to stop_gradient on the
    kp pytree exactly where the reference calls .detach() (train.py:14-21).

BN running stats update once per step from the single KP/G forward, matching
the torch execution (the discriminator carries no running state).

Data parallelism: `make_train_step(axis_name='data')` emits the same program
with `lax.pmean` on grads/metrics; BN stats psum over the mesh axis inside
the layers. Drive it with `jax.shard_map` over a 1-D mesh (see
monkeynet_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from monkeynet_tpu.tasks.losses import (
    discriminator_loss,
    discriminator_loss_names,
    generator_loss,
    generator_loss_names,
)


def split_kp(kp_joined: Dict, detach: bool) -> Dict[str, Dict]:
    """Frame 0 of the joined kp batch is the source; the rest drive."""
    sg = jax.lax.stop_gradient if detach else (lambda v: v)
    return {
        "kp_driving": {k: sg(v[:, 1:]) for k, v in kp_joined.items()},
        "kp_source": {k: sg(v[:, :1]) for k, v in kp_joined.items()},
    }


def multistep_lr(base_lr: float, milestones, steps_per_epoch: int, gamma: float = 0.1):
    """MultiStepLR: lr = base * gamma^(#milestone-epochs passed)."""
    milestones = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(step):
        epoch = step // steps_per_epoch
        drops = jnp.sum(epoch >= milestones)
        return base_lr * (gamma ** drops.astype(jnp.float32))

    return schedule


def make_optimizer(lr_schedule):
    """Adam(betas=(0.5, 0.999)) with the MultiStep schedule, torch-equivalent."""
    return optax.chain(
        optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(lr_schedule),
    )


def restore_adam_moments(opt_state, step, mu, nu):
    """Fill an optax chain state with Adam moments imported from a torch
    checkpoint (utils/torch_import.import_adam_state), so training resumed
    from a reference `.pth.tar` keeps its optimizer state exactly like the
    reference does (reference logger.py:49-66, train.py:84-90).

    Replaces the ScaleByAdamState's (count, mu, nu) and advances every other
    counted transform (the LR-schedule state) to the same step.
    """
    count = jnp.asarray(step, jnp.int32)
    out = []
    for part in opt_state:
        if hasattr(part, "mu") and hasattr(part, "nu"):
            part = part._replace(
                count=count,
                mu=jax.tree.map(jnp.asarray, mu),
                nu=jax.tree.map(jnp.asarray, nu),
            )
        elif hasattr(part, "count"):
            part = part._replace(count=count)
        out.append(part)
    return type(opt_state)(out) if isinstance(opt_state, list) else tuple(out)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_states: Dict[str, Any]


def create_train_state(params, batch_stats, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_states={k: optimizer.init(params[k]) for k in params},
    )


def make_train_step(
    models: Dict[str, Any],
    train_params: Dict[str, Any],
    optimizer,
    axis_name: Optional[str] = None,
):
    """Build the fused G+D train step. Returns fn(state, batch) -> (state, metrics).

    batch: {'source': (B, 1, H, W, C), 'video': (B, Dv, H, W, C)}.
    """
    generator = models["generator"]
    discriminator = models["discriminator"]
    kp_detector = models["kp_detector"]
    loss_weights = train_params["loss_weights"]
    detach_kp_gen = train_params["detach_kp_generator"]
    detach_kp_disc = train_params["detach_kp_discriminator"]
    # Optional mixed precision: forward/backward in bf16 with f32 master
    # weights (grads flow through the cast back to f32); BN statistics are
    # always computed and stored f32 inside the layer.
    compute_dtype = train_params.get("compute_dtype")
    if compute_dtype is not None:
        compute_dtype = jnp.dtype(compute_dtype)

    def cast_compute(tree):
        if compute_dtype is None:
            return tree
        return jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            tree,
        )

    def gmean(v):
        """Global-batch mean of a per-sample loss vector.

        With a mesh axis this is pmean of the local mean — making the
        OBJECTIVE the global mean is what yields exact global-batch gradients
        under shard_map (jax auto-psums cotangents of replicated params, so
        no separate gradient all-reduce is needed or wanted)."""
        m = v.astype(jnp.float32).mean()
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        return m

    # Optional rematerialization: recompute the kp-detector / generator
    # forward during the backward pass instead of keeping every hourglass
    # activation live — trades ~1/3 more FLOPs for the HBM that 256^2 vox
    # configs need.
    remat = bool(train_params.get("remat", False))

    def _kp_forward(kp_params, kp_stats, frames):
        return kp_detector.apply(
            {"params": kp_params, "batch_stats": kp_stats},
            frames, True, mutable=["batch_stats"],
        )

    def _gen_forward(gen_params, gen_stats, source, kp_driving, kp_source):
        return generator.apply(
            {"params": gen_params, "batch_stats": gen_stats},
            source, kp_driving, kp_source, train=True, mutable=["batch_stats"],
        )

    if remat:
        _kp_forward = jax.checkpoint(_kp_forward)
        _gen_forward = jax.checkpoint(_gen_forward)

    def loss_fn(params, batch_stats, batch):
        params = cast_compute(params)
        # uint8 feed (train_loop feed_dtype): rescale on-device to the
        # compute dtype — the batch crosses host->device at 1/4 the bytes.
        batch = {
            k: (v.astype(compute_dtype or jnp.float32) / 255.0
                if v.dtype == jnp.uint8 else v)
            for k, v in batch.items()
        }
        batch = cast_compute(batch)
        source, video = batch["source"], batch["video"]

        kp_joined, kp_mut = _kp_forward(
            params["kp_detector"],
            batch_stats["kp_detector"],
            jnp.concatenate([source, video], axis=1),
        )

        kps = split_kp(kp_joined, detach_kp_gen)
        generated, gen_mut = _gen_forward(
            params["generator"],
            batch_stats["generator"],
            source,
            kps["kp_driving"],
            kps["kp_source"],
        )

        # ---- generator objective: D evaluated with frozen D params, so L_G
        # contributes no discriminator gradients (torch discards them,
        # train.py:119-120).
        kp_nodetach = split_kp(kp_joined, False)
        d_params_sg = jax.lax.stop_gradient(params["discriminator"])
        maps_fake = discriminator.apply(
            {"params": d_params_sg}, generated["video_prediction"], **kp_nodetach
        )
        maps_real = discriminator.apply({"params": d_params_sg}, video, **kp_nodetach)
        gen_losses = generator_loss(
            maps_fake, maps_real, generated["video_deformed"], loss_weights
        )
        loss_g = sum(gmean(l) for l in gen_losses)

        # ---- discriminator objective on detached fakes (train.py:70).
        kp_disc = split_kp(kp_joined, detach_kp_disc)
        fake_sg = jax.lax.stop_gradient(generated["video_prediction"])
        maps_fake_d = discriminator.apply(
            {"params": params["discriminator"]}, fake_sg, **kp_disc
        )
        maps_real_d = discriminator.apply(
            {"params": params["discriminator"]}, video, **kp_disc
        )
        disc_losses = discriminator_loss(maps_fake_d, maps_real_d, loss_weights)
        loss_d = sum(gmean(l) for l in disc_losses)

        new_stats = {
            "generator": gen_mut["batch_stats"],
            "kp_detector": kp_mut["batch_stats"],
        }
        metrics = jnp.stack(
            [gmean(l) for l in gen_losses] + [gmean(l) for l in disc_losses]
        )
        aux = (new_stats, metrics, generated, kp_joined)
        return loss_g + loss_d, aux

    def train_step(state: TrainState, batch):
        grads, (new_stats, metrics, generated, kp_joined) = jax.grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        # No explicit gradient all-reduce: the objective is already the
        # global-batch mean (gmean), and shard_map's transpose psums the
        # cotangents of the replicated params.

        new_params = dict(state.params)
        new_opt = dict(state.opt_states)
        for name in ("generator", "discriminator", "kp_detector"):
            updates, new_opt[name] = optimizer.update(
                grads[name], state.opt_states[name], state.params[name]
            )
            new_params[name] = optax.apply_updates(state.params[name], updates)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_states=new_opt,
        )
        out = {
            "metrics": metrics,
            "video_prediction": generated["video_prediction"],
            "video_deformed": generated["video_deformed"],
            "kp_joined": kp_joined,
        }
        return new_state, out

    return train_step


def largest_divisor_leq(n: int, k: int) -> int:
    """Largest divisor of n that is <= k (>= 1). Used to pick a
    steps-per-dispatch that tiles the total step count exactly, so ONE
    compiled multi-step program serves the whole run (no masked tail, no
    second multi-minute compile for a remainder chunk)."""
    k = max(1, min(k, n))
    for d in range(k, 0, -1):
        if n % d == 0:
            return d
    return 1


def make_multi_train_step(
    models: Dict[str, Any],
    train_params: Dict[str, Any],
    optimizer,
    axis_name: Optional[str] = None,
    augment=None,
):
    """k train steps as ONE XLA program: `lax.scan` over the single step.

    Per-dispatch host costs (pytree flatten, tunnel round-trip, GIL time the
    loader workers contend for) amortize k-fold — on single-core hosts the
    dispatch path measurably starves the data loader otherwise. The device
    runs the k steps back-to-back with no host round-trip in between.

    fn(state, batches) -> (state, out) where batches leaves are stacked
    (k, B, ...) and out contains per-step metrics (k, M) plus the per-step
    visual tensors (k, B, ...) the logger samples at log boundaries.

    With `augment` set (data/device_feed.make_device_augment), batches is
    instead {'videos': HBM-resident uint8 dataset, 'plans': stacked per-step
    augmentation plans}; each scanned step materializes its batch ON DEVICE
    from the plan, and out additionally carries the augmented per-step
    'source'/'video' for the logger's train-vis (nothing else ever leaves
    the device). The videos array rides as a plain argument — passing a
    device-resident array costs nothing per dispatch, and keeping it out of
    the closure keeps it out of the compiled executable.
    """
    step = make_train_step(models, train_params, optimizer, axis_name=axis_name)

    if augment is None:

        def body(state, batch):
            state, out = step(state, batch)
            return state, (
                out["metrics"],
                out["video_prediction"],
                out["video_deformed"],
                out["kp_joined"],
            )

        def multi_step(state: TrainState, batches):
            state, (metrics, vp, vd, kp) = jax.lax.scan(body, state, batches)
            return state, {
                "metrics": metrics,
                "video_prediction": vp,
                "video_deformed": vd,
                "kp_joined": kp,
            }

        return multi_step

    def multi_step_device_feed(state: TrainState, batches):
        videos = batches["videos"]

        def body(state, plan):
            batch = augment(videos, plan)
            state, out = step(state, batch)
            return state, (
                out["metrics"],
                out["video_prediction"],
                out["video_deformed"],
                out["kp_joined"],
                batch["source"],
                batch["video"],
            )

        state, (metrics, vp, vd, kp, src, vid) = jax.lax.scan(
            body, state, batches["plans"]
        )
        return state, {
            "metrics": metrics,
            "video_prediction": vp,
            "video_deformed": vd,
            "kp_joined": kp,
            "source": src,
            "video": vid,
        }

    return multi_step_device_feed


def metric_names(train_params) -> list:
    return generator_loss_names(train_params["loss_weights"]) + discriminator_loss_names()
