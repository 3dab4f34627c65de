"""Top-level training driver: data in, jitted GAN step, logging, checkpoints.

Mirrors the reference train() capabilities (train.py:78-155): three Adam
optimizers (shared MultiStep schedule), resume-from-checkpoint, per-iteration
logging with running means, train-vis gifs, epoch checkpoints. The whole
optimization step — both GAN sides and all three updates — is one compiled
XLA program (see tasks/train.py), and batches stream through a threaded
double-buffered loader.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from monkeynet_tpu.data.loader import DataLoader, device_prefetch, quantize_feed
from monkeynet_tpu.tasks.build import init_models
from monkeynet_tpu.tasks.train import (
    TrainState,
    create_train_state,
    largest_divisor_leq,
    make_multi_train_step,
    make_optimizer,
    metric_names,
    multistep_lr,
)
from monkeynet_tpu.utils.checkpoint import load_any
from monkeynet_tpu.utils.logger import Logger


def train(config, log_dir, dataset, checkpoint=None, seed=0, num_devices=1,
          profile_dir=None):
    train_params = config["train_params"]
    image_shape = tuple(config["dataset_params"].get("image_shape", (64, 64, 3)))

    if num_devices > 1 and train_params["batch_size"] % num_devices != 0:
        raise ValueError(
            f"batch_size {train_params['batch_size']} must be divisible by "
            f"num_devices {num_devices} for data-parallel training"
        )

    # Multi-host: every process loads only its contiguous shard of the global
    # batch (all processes walk the same seed-keyed permutation), and
    # shard_host_local_batch assembles the global batch-sharded array
    # (jax.make_array_from_process_local_data) so no host ever materializes
    # the full batch. The assembled global batch is bit-identical to the
    # single-process one.
    process_count = jax.process_count()
    if train_params["batch_size"] % process_count != 0:
        raise ValueError(
            f"batch_size {train_params['batch_size']} must be divisible by "
            f"the process count {process_count}"
        )
    local_batch_size = train_params["batch_size"] // process_count

    # uint8 feed: ship the batch to the device as uint8 (4x less
    # host->device traffic than f32; the jitted step rescales to the
    # compute dtype on-device). The sources are 8-bit media, so the
    # only loss is re-quantizing augmentation interpolants. Quantization
    # runs in the loader workers, with the rest of the host batch work.
    feed_uint8 = train_params.get("feed_dtype", "float32") == "uint8"
    # num_workers default 2: measured on single-core hosts, 4 decode threads
    # convoy on the GIL against the dispatch thread (4 workers: 36.5
    # batches/s; 1-2 workers: 37-39) — more threads only add switch overhead
    # when there is one core to share.
    loader = DataLoader(
        dataset,
        batch_size=local_batch_size,
        shuffle=True,
        drop_last=True,
        num_workers=int(train_params.get("num_workers", 2)),
        seed=seed,
        num_shards=process_count,
        shard_index=jax.process_index(),
        postprocess=quantize_feed if feed_uint8 else None,
    )
    steps_per_epoch = max(1, len(loader))

    axis_name = "data" if num_devices > 1 else None
    models, params, batch_stats = init_models(
        config, jax.random.PRNGKey(seed), image_shape, axis_name=axis_name
    )

    lr = multistep_lr(
        train_params["lr"], train_params["epoch_milestones"], steps_per_epoch
    )
    optimizer = make_optimizer(lr)
    state = create_train_state(params, batch_stats, optimizer)

    start_epoch, it = 0, 0
    if checkpoint is not None:
        templates = {
            name: {"params": params[name], **(
                {"batch_stats": batch_stats[name]} if name in batch_stats else {}
            )}
            for name in params
        }
        loaded = load_any(checkpoint, templates)
        if "state" in loaded:  # our own full checkpoint
            state = restore_train_state(state, loaded["state"])
        else:  # torch checkpoint: params + stats (+ Adam moments if saved)
            from monkeynet_tpu.tasks.train import restore_adam_moments

            new_params = dict(state.params)
            new_stats = dict(state.batch_stats)
            new_opt = dict(state.opt_states)
            for name in params:
                variables = loaded.get(name)
                if not isinstance(variables, dict):
                    continue
                new_params[name] = variables["params"]
                if "batch_stats" in variables:
                    new_stats[name] = variables["batch_stats"]
                moments = loaded.get(f"optimizer_{name}")
                if moments is not None:
                    # The reference restores each model's Adam state on
                    # resume (reference logger.py:49-66); mirror it so a
                    # resumed published checkpoint keeps its moments.
                    new_opt[name] = restore_adam_moments(
                        state.opt_states[name], **moments
                    )
            state = state.replace(
                params=new_params, batch_stats=new_stats, opt_states=new_opt
            )
        start_epoch = int(loaded.get("epoch", 0))
        it = int(loaded.get("it", 0))
        state = state.replace(step=jnp.asarray(it, jnp.int32))
        # Continue the data stream, don't replay it: the shuffle order and
        # per-item augmentation RNG are keyed by (seed, epoch), so a resumed
        # run must pick up at the restored epoch to consume the same batch
        # sequence as an uninterrupted run.
        loader.epoch = start_epoch

    # Scan-of-k dispatch: k consecutive train steps run as ONE XLA program
    # (lax.scan over the fused GAN step). Per-dispatch host cost — pytree
    # flatten, tunnel round-trip, and above all the GIL time the dispatch
    # thread steals from the loader workers on single-core hosts — amortizes
    # k-fold. k is the largest divisor of the total step count <= the
    # requested steps_per_dispatch, so one compiled program covers the whole
    # run with no masked/ragged tail chunk.
    total_steps = max(
        1, (train_params["num_epochs"] - start_epoch) * steps_per_epoch
    )
    # Default 32: the tunneled H2D path costs ~50 ms fixed per device_put
    # plus ~15 GB/s-equivalent marginal bytes (measured), and per-dispatch
    # host work is ~30 ms — at k=30 both amortize to ~1 ms/step and hide
    # behind the ~28 ms device step.
    k = largest_divisor_leq(
        total_steps, int(train_params.get("steps_per_dispatch", 32))
    )
    # The loader's in-flight bound must cover ~2 chunks, or the worker
    # pipeline fills its few slots during the device's compute window, goes
    # idle, and the feeder then pulls the next k batches at production rate
    # instead of from a warm buffer (measured: the difference between ~16
    # and ~30 sustained steps/s on actions). Memory stays bounded:
    # 2k batches of uint8 feed is ~50 MB at actions size.
    loader.prefetch = max(loader.prefetch, 2 * k)

    mesh = None
    if num_devices > 1:
        from monkeynet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(num_devices)

    # Device-resident feed (train_params.device_feed): the uint8 dataset is
    # device_put ONCE and augmentation runs inside the train program from
    # tiny host-built plans — see data/device_feed.py. This removes the
    # per-step H2D pixel traffic that otherwise caps single-core hosts at
    # ~2/3 of the chip's step rate (scripts/chunk_probe.py measurements).
    device_feed = bool(train_params.get("device_feed", False))
    augment = None
    videos_dev = lengths = None
    if device_feed:
        from monkeynet_tpu.data.device_feed import (
            CacheOverBudget,
            build_video_cache,
            cache_budget_bytes,
            make_device_augment,
            padding_overhead,
        )

        transform = dataset.transform
        if not (
            hasattr(transform, "supports_device_feed")
            and transform.supports_device_feed(image_shape[0], image_shape[1])
        ):
            raise ValueError(
                "device_feed: true requires an augmentation pipeline with an "
                "exact on-device formulation (nearest resize with ratio "
                "> ~0.8 so the anti-alias prefilter stays identity); use the "
                "host feed for this config"
            )
        # HBM guard: the padded (N, Tmax, H, W, C) cache must fit the budget
        # (train_params.device_feed_hbm_gb, default half the allocator
        # limit). Over budget degrades to the host feed with a warning — the
        # reference streams from disk and never assumes device residency
        # (reference frames_dataset.py:14-40), so neither may we fail hard.
        budget = cache_budget_bytes(train_params)
        try:
            videos_np, lengths = build_video_cache(dataset, budget_bytes=budget)
        except CacheOverBudget as e:
            print(
                f"WARNING: device_feed disabled — {e}; set "
                "train_params.device_feed_hbm_gb to raise the budget, or "
                "leave the host feed (this run) for datasets larger than HBM"
            )
            device_feed = False
        else:
            padded, real = padding_overhead(lengths, image_shape)
            if padded > 1.5 * real:
                print(
                    f"device_feed: Tmax padding overhead {padded / real:.2f}x "
                    f"({padded / 2**30:.2f} GiB padded vs "
                    f"{real / 2**30:.2f} GiB of real frames)"
                )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                videos_dev = jax.device_put(
                    videos_np, NamedSharding(mesh, P())
                )
            else:
                videos_dev = jax.device_put(videos_np)
            augment = make_device_augment(transform, image_shape)

    if mesh is not None:
        from monkeynet_tpu.parallel.mesh import make_sharded_multi_train_step

        step_fn = make_sharded_multi_train_step(
            models, train_params, optimizer, mesh=mesh, augment=augment
        )
    else:
        step_fn = jax.jit(
            make_multi_train_step(
                models, train_params, optimizer, axis_name=None,
                augment=augment,
            ),
            donate_argnums=0,
        )

    names = metric_names(train_params)
    log_params = dict(train_params.get("log_params", {}))
    with Logger(
        log_dir=log_dir,
        visualizer_params=config.get("visualizer_params"),
        **log_params,
    ) as logger:
        profile_span = (10, 20) if profile_dir else None
        epoch_steps = 0
        last_finished = start_epoch - 1

        def chunked(stream):
            """Group the (epoch, batch) stream into scan-of-k chunks."""
            eps, buf = [], []
            for ep, batch in stream:
                eps.append(ep)
                buf.append(batch)
                if len(buf) == k:
                    yield eps[-1], (eps, buf)
                    eps, buf = [], []
            if buf:  # defensive: k divides total_steps, so normally empty
                yield eps[-1], (eps, buf)

        def place(item):
            """Runs on the prefetch feeder thread: stack the chunk's k
            batches (or augmentation plans) and stage the device feed for
            chunk N+1 while chunk N runs, so the consumer thread never waits
            on a host->device transfer (the torch-DataLoader pinned-memory
            overlap, reference train.py:99)."""
            eps, buf = item
            keys = buf[0].keys() if device_feed else ("source", "video")
            x = {key: np.stack([b[key] for b in buf]) for key in keys}
            if mesh is not None:
                # Explicit batch-axis placement (axis 1 of the (k, B, ...)
                # stack); on multi-host runs each process contributes its
                # local shard of the global batch.
                from monkeynet_tpu.parallel.distributed import (
                    shard_host_local_batch,
                )

                x = shard_host_local_batch(x, mesh, batch_axis=1)
            else:
                x = jax.device_put(x)
            if device_feed:
                # videos are already device-resident; passing the handle
                # costs nothing per dispatch.
                x = {"videos": videos_dev, "plans": x}
            return x, eps, buf

        if device_feed:
            from monkeynet_tpu.data.device_feed import plan_stream

            stream = plan_stream(
                dataset,
                dataset.transform,
                lengths,
                local_batch_size,
                seed,
                start_epoch,
                train_params["num_epochs"] - start_epoch,
                num_shards=process_count,
                shard_index=jax.process_index(),
            )
        else:
            # ONE persistent worker pool across all epochs (loader.stream):
            # per-epoch pools paid thread startup + a cold prefetch pipeline
            # every epoch, the dominant loop overhead on 1-step-per-epoch
            # recipes like actions.
            stream = loader.stream(train_params["num_epochs"] - start_epoch)

        for _, (x, eps, buf) in device_prefetch(chunked(stream), place):
            if profile_span and profile_span[0] != "on" and it >= profile_span[0]:
                jax.profiler.start_trace(profile_dir)
                profile_span = ("on", profile_span[1])
            state, out = step_fn(state, x)
            nsteps = len(eps)
            # Re-stage the exit-checkpoint closure over the FRESH state
            # every chunk: step_fn donates its input state's buffers, so a
            # closure captured at the previous epoch boundary would hold
            # deleted arrays by the time an interrupt unwinds into the
            # Logger's emergency save. The newest state is only donated
            # when the NEXT chunk dispatches, so an interrupt between
            # chunks (the common case) checkpoints cleanly.
            logger.stage_payload(_make_payload(state, eps[-1], it + nsteps))
            if (
                profile_span
                and profile_span[0] == "on"
                and it + nsteps > profile_span[1]
            ):
                jax.block_until_ready(out["metrics"])
                jax.profiler.stop_trace()
                profile_span = None

            def vis(j, out=out, buf=buf):
                """Materialize the j-th step's visual tensors (log
                boundaries only — the loop itself never blocks on a
                device->host sync)."""
                from monkeynet_tpu.tasks.train import split_kp

                kp_parts = split_kp(
                    jax.tree.map(
                        lambda a: np.asarray(a[j]), out["kp_joined"]
                    ),
                    False,
                )
                vis_out = {
                    "video_prediction": np.asarray(out["video_prediction"][j]),
                    "video_deformed": np.asarray(out["video_deformed"][j]),
                    **kp_parts,
                }
                if device_feed:
                    # The augmented inputs only exist on-device; the multi
                    # step returns them per step for exactly this purpose.
                    vis_inp = {
                        "source": np.asarray(out["source"][j]),
                        "video": np.asarray(out["video"][j]),
                    }
                    return vis_inp, vis_out
                # The visualizer expects [0,1] floats; undo the uint8 feed
                # quantization (log steps only).
                vis_inp = {
                    key: v.astype(np.float32) / 255.0
                    if isinstance(v, np.ndarray) and v.dtype == np.uint8
                    else v
                    for key, v in buf[j].items()
                }
                return vis_inp, vis_out

            # Metrics stay a device array; rows materialize at boundaries.
            logger.log_chunk(it, names, out["metrics"], nsteps, vis=vis)
            # Release the chunk's stacked visual outputs NOW: the loop
            # variable would otherwise keep them alive while the NEXT chunk
            # executes, and (k, B, Dv, H, W, C) visuals are ~1 GB of HBM at
            # 256^2 k=30 — the margin between fitting and ResourceExhausted
            # on the second dispatch (measured, shapes-256 round 5).
            out = vis = None
            it += nsteps
            epoch_steps += nsteps
            if epoch_steps >= steps_per_epoch:
                # One or more epochs finished inside this chunk. Fire ONE
                # log_epoch labeled with the newest finished epoch; the
                # logger checkpoints if ANY finished epoch hits cpk_freq.
                # The payload is the chunk-end state — with k > 1 a
                # checkpoint can carry up to k-1 steps past the labeled
                # boundary, the scan-granularity analog of the reference's
                # own resume convention (it replays the saved epoch,
                # reference logger.py:49-66 + train.py:85-87).
                epoch_steps %= steps_per_epoch
                j = nsteps - 1 - epoch_steps
                finished = eps[j]
                logger.log_epoch(
                    finished,
                    _make_payload(state, finished, it - epoch_steps),
                    prev_epoch=last_finished,
                )
                last_finished = finished
    return state


def _make_payload(state, epoch: int, it: int):
    """Lazy checkpoint payload: materializing the full train state is a large
    device->host fetch, so the closure runs only when the Logger actually
    checkpoints (cpk_freq_epoch boundaries + exit)."""

    def payload():
        from flax import serialization

        return {
            "state": serialization.to_state_dict(
                jax.tree.map(np.asarray, state)
            ),
            "epoch": epoch,
            "it": it,
        }

    return payload


def restore_train_state(template: TrainState, loaded) -> TrainState:
    """Restore a TrainState from its serialized (nested-dict) form."""
    from flax import serialization

    return serialization.from_state_dict(template, loaded)
