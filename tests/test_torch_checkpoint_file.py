"""End-to-end ingestion of a reference-format torch checkpoint FILE.

Closes the BASELINE.md parity loop as far as the offline environment allows:
published Monkey-Net weights are network-blocked, so we mint a checkpoint
locally with the reference's own code — train its three modules a few CPU
steps on the bundled shapes data, save in the reference's `.pth.tar` layout
(reference logger.py:43-47) — then load that file through `load_any`
(exercising utils/checkpoint.py magic sniffing + utils/torch_import.py
`load_torch_checkpoint`) and compare full reconstruction outputs computed by
BOTH frameworks from that single file (reference reconstruction.py:12-25,
52-62 vs our fused TransferEngine).
"""

import copy
import os

import numpy as np
import pytest

from monkeynet_tpu.data.io import read_video

from .reference_shim import load_reference
from .test_train import TINY_CONFIG

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch/reference unavailable")

SHAPES_DIR = "/root/repo/data/shapes"
H = W = 16


def _shapes_video(split, index, num_frames):
    """A bundled shapes video resized to 16^2, (1, C, T, H, W) torch layout."""
    import cv2

    root = os.path.join(SHAPES_DIR, split)
    name = sorted(os.listdir(root))[index]
    video = read_video(os.path.join(root, name), image_shape=(64, 64, 3))
    video = video[:num_frames]
    video = np.stack(
        [cv2.resize(f, (W, H), interpolation=cv2.INTER_AREA) for f in video]
    )
    return np.transpose(video, (3, 0, 1, 2))[None].astype(np.float32)


@pytest.fixture(scope="module")
def minted_checkpoint(tmp_path_factory):
    """Train the reference a few steps on bundled shapes data and save a
    checkpoint with the exact layout of reference Logger.save_cpk
    (logger.py:43-47): model + optimizer state_dicts + epoch + it."""
    import torch
    from modules.discriminator import Discriminator as RefDisc
    from modules.generator import MotionTransferGenerator as RefGen
    from modules.keypoint_detector import KPDetector as RefKP
    from train import DiscriminatorFullModel, GeneratorFullModel

    mp = TINY_CONFIG["model_params"]
    tp = copy.deepcopy(TINY_CONFIG["train_params"])
    torch.manual_seed(0)
    generator = RefGen(**mp["generator_params"], **mp["common_params"])
    discriminator = RefDisc(**mp["discriminator_params"], **mp["common_params"])
    kp_detector = RefKP(**mp["kp_detector_params"], **mp["common_params"])

    gen_full = GeneratorFullModel(kp_detector, generator, discriminator, tp)
    disc_full = DiscriminatorFullModel(kp_detector, generator, discriminator, tp)
    opt_g = torch.optim.Adam(generator.parameters(), lr=tp["lr"], betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(
        discriminator.parameters(), lr=tp["lr"], betas=(0.5, 0.999)
    )
    opt_kp = torch.optim.Adam(
        kp_detector.parameters(), lr=tp["lr"], betas=(0.5, 0.999)
    )

    # Three iterations of the reference's alternating step (train.py:108-136),
    # each on a (source, driving) pair from a different bundled shapes video.
    for it in range(3):
        video = torch.from_numpy(_shapes_video("train", it, 2))
        x = {"source": video[:, :, :1], "video": video[:, :, 1:]}
        out = gen_full(x)
        loss_values = out[:-2]
        loss = sum(v.mean() for v in loss_values)
        loss.backward(retain_graph=not tp["detach_kp_discriminator"])
        opt_g.step(); opt_g.zero_grad(); opt_d.zero_grad()
        if tp["detach_kp_discriminator"]:
            opt_kp.step(); opt_kp.zero_grad()
        generated = {k: v.detach() for k, v in out[-2].items() if hasattr(v, "detach")}
        kp_joined = {k: v.detach() for k, v in out[-1].items()}
        out_d = disc_full(x, kp_joined, generated)
        sum(v.mean() for v in out_d).backward()
        opt_d.step(); opt_d.zero_grad()
        if not tp["detach_kp_discriminator"]:
            opt_kp.step()
        opt_kp.zero_grad()

    cpk = {
        "generator": generator.state_dict(),
        "discriminator": discriminator.state_dict(),
        "kp_detector": kp_detector.state_dict(),
        "optimizer_generator": opt_g.state_dict(),
        "optimizer_discriminator": opt_d.state_dict(),
        "optimizer_kp_detector": opt_kp.state_dict(),
        "epoch": 7,
        "it": 3,
    }
    path = str(tmp_path_factory.mktemp("cpk") / "0000007-checkpoint.pth.tar")
    torch.save(cpk, path)
    models = {
        "generator": generator.eval(),
        "kp_detector": kp_detector.eval(),
    }
    return path, models


@needs_ref
def test_load_any_parses_pth_tar_file(minted_checkpoint):
    """load_any must sniff the torch zip format, translate every key, and
    surface epoch/it (utils/checkpoint.py:52-68, utils/torch_import.py)."""
    import jax

    from monkeynet_tpu.tasks.build import init_models
    from monkeynet_tpu.utils.checkpoint import load_any

    path, _ = minted_checkpoint
    _, params, batch_stats = init_models(
        TINY_CONFIG, jax.random.PRNGKey(0), (H, W, 3)
    )
    templates = {
        "generator": {
            "params": params["generator"], "batch_stats": batch_stats["generator"]
        },
        "kp_detector": {
            "params": params["kp_detector"],
            "batch_stats": batch_stats["kp_detector"],
        },
    }
    loaded = load_any(path, templates)
    assert loaded["epoch"] == 7 and loaded["it"] == 3
    assert set(loaded["generator"]) == {"params", "batch_stats"}
    # Training moved the weights: imported params must differ from init.
    flat_init = jax.tree.leaves(params["generator"])
    flat_loaded = jax.tree.leaves(loaded["generator"]["params"])
    assert any(
        not np.allclose(a, b) for a, b in zip(flat_init, flat_loaded)
    )


@needs_ref
def test_adam_moments_import_layout(minted_checkpoint):
    """import_adam_state must land each exp_avg/exp_avg_sq on the same leaf,
    with the same layout transform, as the weights themselves: feeding the
    exp_avg tensors through the WEIGHT converter (import_state_dict keyed by
    parameter name) is the oracle."""
    import jax

    from monkeynet_tpu.tasks.build import init_models
    from monkeynet_tpu.utils.torch_import import (
        import_adam_state,
        import_state_dict,
        load_torch_checkpoint,
    )

    path, _ = minted_checkpoint
    _, params, _ = init_models(TINY_CONFIG, jax.random.PRNGKey(0), (H, W, 3))
    raw = load_torch_checkpoint(path)

    for name in ("generator", "kp_detector", "discriminator"):
        model_sd = raw[name]
        opt_sd = raw[f"optimizer_{name}"]
        step, mu, nu = import_adam_state(params[name], model_sd, opt_sd)
        assert step == 3  # three minted iterations stepped every optimizer

        # Oracle: torch state entries are indexed in parameters() order ==
        # param-entry order of the state_dict; rekey exp_avg by param name
        # and run it through the tested weight converter.
        param_keys = [
            k for k in model_sd
            if not k.endswith(("running_mean", "running_var",
                               "num_batches_tracked"))
        ]
        order = [i for g in opt_sd["param_groups"] for i in g["params"]]
        for field, got_tree in (("exp_avg", mu), ("exp_avg_sq", nu)):
            fake_sd = {
                k: opt_sd["state"][i][field]
                for k, i in zip(param_keys, order)
            }
            want = import_state_dict({"params": params[name]}, fake_sd)
            got_flat = jax.tree.leaves(got_tree)
            want_flat = jax.tree.leaves(want["params"])
            assert len(got_flat) == len(want_flat)
            for g, w in zip(got_flat, want_flat):
                np.testing.assert_array_equal(g, w)


@needs_ref
def test_torch_optimizer_resume_one_step_matches_reference(
    minted_checkpoint, monkeypatch
):
    """Resume training from the minted .pth.tar in BOTH frameworks and take
    one identical iteration: with the Adam moments restored, the parameter
    updates match closely; with cold optimizers they do not. This is the
    behavior the reference gets from Logger.load_cpk restoring the three
    optimizers (reference logger.py:49-66, train.py:84-90).

    Both sides run a constant lr (the reference's scheduler is epoch-driven
    and out of scope here — multistep_lr has its own tests).

    Runs the MATERIALIZED up-conv (torch's exact formulation): the fused
    lhs-dilated form reorders f32 summation, and Adam's grad/sqrt(v)
    normalization amplifies that on near-zero-gradient elements past this
    test's tight distribution bounds. Formulation equivalence is pinned
    separately in tests/test_blocks.py; this test isolates optimizer-state
    restore."""
    monkeypatch.setenv("MONKEYNET_FUSED_UPCONV", "0")
    import copy as _copy

    import jax
    import jax.numpy as jnp
    import torch
    from modules.discriminator import Discriminator as RefDisc
    from modules.generator import MotionTransferGenerator as RefGen
    from modules.keypoint_detector import KPDetector as RefKP
    from train import DiscriminatorFullModel, GeneratorFullModel

    from monkeynet_tpu.tasks.build import init_models
    from monkeynet_tpu.tasks.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
        restore_adam_moments,
    )
    from monkeynet_tpu.utils.checkpoint import load_any
    from monkeynet_tpu.utils.torch_import import import_state_dict

    path, _ = minted_checkpoint
    mp = TINY_CONFIG["model_params"]
    tp = _copy.deepcopy(TINY_CONFIG["train_params"])
    video = torch.from_numpy(_shapes_video("train", 3, 2))
    x_t = {"source": video[:, :, :1], "video": video[:, :, 1:]}

    # --- reference resume: fresh modules + optimizers, all state from file.
    cpk = torch.load(path, map_location="cpu", weights_only=False)
    generator = RefGen(**mp["generator_params"], **mp["common_params"])
    discriminator = RefDisc(**mp["discriminator_params"], **mp["common_params"])
    kp_detector = RefKP(**mp["kp_detector_params"], **mp["common_params"])
    generator.load_state_dict(cpk["generator"])
    discriminator.load_state_dict(cpk["discriminator"])
    kp_detector.load_state_dict(cpk["kp_detector"])
    opts = {}
    for name, model in (
        ("generator", generator),
        ("discriminator", discriminator),
        ("kp_detector", kp_detector),
    ):
        opts[name] = torch.optim.Adam(
            model.parameters(), lr=tp["lr"], betas=(0.5, 0.999)
        )
        opts[name].load_state_dict(cpk[f"optimizer_{name}"])

    gen_full = GeneratorFullModel(kp_detector, generator, discriminator, tp)
    disc_full = DiscriminatorFullModel(kp_detector, generator, discriminator, tp)
    before_t = {
        name: {k: v.detach().clone() for k, v in m.state_dict().items()}
        for name, m in (
            ("generator", generator),
            ("discriminator", discriminator),
            ("kp_detector", kp_detector),
        )
    }
    # One reference alternating iteration (reference train.py:108-136).
    out = gen_full(x_t)
    sum(v.mean() for v in out[:-2]).backward(
        retain_graph=not tp["detach_kp_discriminator"]
    )
    opts["generator"].step(); opts["generator"].zero_grad()
    opts["discriminator"].zero_grad()
    if tp["detach_kp_discriminator"]:
        opts["kp_detector"].step(); opts["kp_detector"].zero_grad()
    generated = {
        k: v.detach() for k, v in out[-2].items() if hasattr(v, "detach")
    }
    kp_joined = {k: v.detach() for k, v in out[-1].items()}
    sum(v.mean() for v in disc_full(x_t, kp_joined, generated)).backward()
    opts["discriminator"].step(); opts["discriminator"].zero_grad()
    if not tp["detach_kp_discriminator"]:
        opts["kp_detector"].step()

    # --- our resume from the same file.
    models, params, batch_stats = init_models(
        TINY_CONFIG, jax.random.PRNGKey(0), (H, W, 3)
    )
    templates = {
        name: {"params": params[name], **(
            {"batch_stats": batch_stats[name]} if name in batch_stats else {}
        )}
        for name in params
    }
    loaded = load_any(path, templates)
    optimizer = make_optimizer(lambda step: tp["lr"])
    new_params = {name: loaded[name]["params"] for name in params}
    new_stats = {
        name: loaded[name]["batch_stats"]
        for name in batch_stats if "batch_stats" in loaded.get(name, {})
    }
    state = create_train_state(new_params, new_stats, optimizer)
    warm_opt = {
        name: restore_adam_moments(
            state.opt_states[name], **loaded[f"optimizer_{name}"]
        )
        for name in params
    }
    state = state.replace(
        step=jnp.asarray(loaded["it"], jnp.int32), opt_states=warm_opt
    )

    x_j = {
        "source": jnp.asarray(
            np.transpose(x_t["source"].numpy(), (0, 2, 3, 4, 1))),
        "video": jnp.asarray(
            np.transpose(x_t["video"].numpy(), (0, 2, 3, 4, 1))),
    }
    step_fn = jax.jit(make_train_step(models, tp, optimizer))
    new_state, _ = step_fn(state, x_j)

    # --- compare per-model parameter updates in flax layout.
    def torch_delta(name, model):
        after = model.state_dict()
        delta_sd = {
            k: (after[k] - before_t[name][k]).numpy()
            for k in after
            if not k.endswith(
                ("num_batches_tracked", "running_mean", "running_var")
            )
        }
        return import_state_dict({"params": params[name]}, delta_sd)["params"]

    def delta(new):
        return {
            name: np.concatenate([
                np.ravel(np.asarray(b) - np.asarray(a))
                for a, b in zip(
                    jax.tree.leaves(state.params[name]),
                    jax.tree.leaves(new.params[name]),
                )
            ])
            for name in params
        }

    # --- control: the same step WITHOUT restored moments.
    cold_state = state.replace(
        opt_states={k: optimizer.init(state.params[k]) for k in params}
    )
    cold_new, _ = step_fn(cold_state, x_j)
    d_warm, d_cold = delta(new_state), delta(cold_new)

    lr = tp["lr"]
    for name, model in (
        ("generator", generator),
        ("discriminator", discriminator),
        ("kp_detector", kp_detector),
    ):
        d_ref = np.concatenate([
            np.ravel(x) for x in jax.tree.leaves(torch_delta(name, model))
        ])
        scale = np.abs(d_ref).max()
        assert scale > 0.1 * lr  # the step actually moved this model

        # Distribution-based agreement: conv biases that feed straight into
        # BatchNorm have mathematically ZERO gradient (BN subtracts the
        # mean), so Adam turns f32 cross-framework noise into full-scale
        # +-lr steps of arbitrary sign on those few elements — measured
        # p99 of |d_ours - d_ref| is ~1e-7 while the worst such bias is
        # ~2*lr, in BOTH directions. Assert the bulk matches and only a
        # sliver of degenerate elements disagrees; the cold control shows
        # what a genuinely unrestored optimizer looks like.
        diff = np.abs(d_warm[name] - d_ref)
        rel_l2 = np.linalg.norm(diff) / np.linalg.norm(d_ref)
        frac_off = float(np.mean(diff > 0.05 * scale))
        assert np.quantile(diff, 0.99) <= 0.1 * scale, name
        assert frac_off <= 0.02, (name, frac_off)
        assert rel_l2 <= 0.25, (name, rel_l2)

        cold_diff = np.abs(d_cold[name] - d_ref)
        cold_rel = np.linalg.norm(cold_diff) / np.linalg.norm(d_ref)
        cold_frac = float(np.mean(cold_diff > 0.05 * scale))
        assert cold_rel > 2 * rel_l2, (name, cold_rel, rel_l2)
        assert cold_frac > 10 * frac_off, (name, cold_frac, frac_off)


@needs_ref
def test_cross_framework_reconstruction_from_one_file(minted_checkpoint):
    """Both frameworks reconstruct a bundled shapes test video from the SAME
    .pth.tar: per-frame L1 between the two generated videos <= 1e-3."""
    import jax.numpy as jnp
    import torch

    from monkeynet_tpu.tasks.animate import TransferEngine
    from monkeynet_tpu.tasks.reconstruction import load_eval_models

    path, ref_models = minted_checkpoint
    config = copy.deepcopy(TINY_CONFIG)
    video_t = torch.from_numpy(_shapes_video("test", 0, 8))

    # Reference reconstruction (reconstruction.py:56-62 + generate :12-25).
    def cat_dict(list_of_dicts, dim):
        return {
            k: torch.cat([d[k] for d in list_of_dicts], dim=dim)
            for k in list_of_dicts[0]
        }

    kp_detector = ref_models["kp_detector"]
    generator = ref_models["generator"]
    with torch.no_grad():
        kp_appearance = kp_detector(video_t[:, :, :1])
        d = video_t.shape[2]
        kp_video = cat_dict(
            [kp_detector(video_t[:, :, i:(i + 1)]) for i in range(d)], dim=1
        )
        preds = []
        for i in range(d):
            kp_target = {k: v[:, i:(i + 1)] for k, v in kp_video.items()}
            out_part = generator(
                video_t[:, :, :1], kp_driving=kp_target, kp_source=kp_appearance
            )
            preds.append(out_part["video_prediction"])
        ref_pred = torch.cat(preds, dim=2).numpy()  # (1, C, D, H, W)

    # Our reconstruction from the same file (tasks/reconstruction.py path).
    models, gen_vars, kp_vars = load_eval_models(config, path, (H, W, 3))
    engine = TransferEngine(
        models["generator"], models["kp_detector"], gen_vars, kp_vars,
        move_location=False,
    )
    video_j = np.transpose(video_t.numpy(), (0, 2, 3, 4, 1))  # (1, D, H, W, C)
    out = engine(jnp.asarray(video_j[:, :1]), jnp.asarray(video_j))
    ours_pred = np.transpose(np.asarray(out["video_prediction"]), (0, 4, 1, 2, 3))

    assert ours_pred.shape == ref_pred.shape
    per_frame_l1 = np.abs(ours_pred - ref_pred).mean(axis=(0, 1, 3, 4))
    assert per_frame_l1.max() <= 1e-3, per_frame_l1
