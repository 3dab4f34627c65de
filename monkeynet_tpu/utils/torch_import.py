"""Import published PyTorch Monkey-Net checkpoints into our flax pytrees.

The reference saves one `.pth.tar` with state_dicts for generator /
kp_detector / discriminator (+ optimizers) (reference: logger.py:43-66). This
module converts those tensors into our channels-last flax layout so eval-mode
parity against published checkpoints can be verified, and is also used by the
golden-value tests to copy torch-initialized reference modules into our
models.

Name translation (flax path -> torch key) and weight layout transforms:
  conv kernels: torch (out, in/g, kt, kh, kw) -> flax (kh, kw, in/g, out)
    [kt squeezed] or (kt, kh, kw, in/g, out) for temporal kernels.
  dense kernels: torch (out, in) -> flax (in, out).
  GRU weights: stored in torch layout already (see models/prediction.py).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict


def _flax_path_to_torch_key(path, collection: str) -> str:
    """Map a flattened flax variable path to the reference state_dict key."""
    parts = list(path)
    leaf = parts.pop()

    # Collapse the nn.Conv inside our Conv3D wrapper: (.. wrapper, 'conv', leaf)
    if leaf in ("kernel", "bias") and parts and parts[-1] == "conv":
        parts.pop()
        leaf = {"kernel": "weight", "bias": "bias"}[leaf]
    elif collection == "batch_stats":
        leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
    elif leaf in ("scale", "bias") and parts and parts[-1].startswith(("norm", "kp_norm")):
        leaf = {"scale": "weight", "bias": "bias"}[leaf]
    elif parts and parts[-1] == "head":
        parts.pop()
        parts.append("linear")
        leaf = {"kernel": "weight", "bias": "bias"}[leaf]
    elif parts and parts[-1].startswith("gru"):
        layer = parts.pop()[3:]
        parts.append("rnn")
        leaf = f"{leaf}_l{layer}"

    out = []
    for i, p in enumerate(parts):
        if m := re.fullmatch(r"down(\d+)", p):
            out.append(f"down_blocks.{m.group(1)}")
        elif m := re.fullmatch(r"up(\d+)", p):
            out.append(f"up_blocks.{m.group(1)}")
        elif m := re.fullmatch(r"refine(\d+)", p):
            out.append(f"refinement_module.r{m.group(1)}")
        elif m := re.fullmatch(r"group_block(\d+)", p):
            out.append(f"group_blocks.{m.group(1)}")
        elif p == "dense_motion":
            out.append("dense_motion_module")
        elif p == "score_conv":
            out.append("conv")
        elif p == "final_conv":
            if out and out[-1] == "decoder":
                out.append("conv")
            else:  # generator refinement head
                out.append("refinement_module.conv-last")
        else:
            out.append(p)
    out.append(leaf)
    return ".".join(out)


def _convert_tensor(torch_value: np.ndarray, flax_shape) -> np.ndarray:
    """Layout-convert one torch tensor to the expected flax shape."""
    v = np.asarray(torch_value)
    if v.shape == tuple(flax_shape):
        return v
    if v.ndim == 5:  # conv3d kernel (out, in/g, kt, kh, kw)
        if len(flax_shape) == 4:  # spatial-only: squeeze kt
            assert v.shape[2] == 1, f"temporal kernel into 2D conv: {v.shape}"
            out = v[:, :, 0].transpose(2, 3, 1, 0)
        else:
            out = v.transpose(2, 3, 4, 1, 0)
    elif v.ndim == 2:  # dense (out, in) -> (in, out)
        out = v.T
    else:
        raise ValueError(f"cannot convert {v.shape} -> {tuple(flax_shape)}")
    assert out.shape == tuple(flax_shape), (out.shape, flax_shape)
    return out


def import_state_dict(
    variables: Mapping[str, Any], state_dict: Mapping[str, np.ndarray]
) -> Dict[str, Any]:
    """Fill a flax variables pytree {'params', 'batch_stats', ...} from a
    torch state_dict (values as numpy arrays). Raises on unmatched keys."""
    result = {}
    used = set()
    for collection, tree in variables.items():
        flat = flatten_dict(tree)
        new_flat = {}
        for path, value in flat.items():
            key = _flax_path_to_torch_key(path, collection)
            if key not in state_dict:
                raise KeyError(
                    f"no torch key for flax {collection}:{'/'.join(path)} "
                    f"(expected '{key}')"
                )
            new_flat[path] = _convert_tensor(state_dict[key], np.shape(value)).astype(
                np.asarray(value).dtype
            )
            used.add(key)
        result[collection] = unflatten_dict(new_flat)
    leftovers = {
        k for k in state_dict if k not in used and "num_batches_tracked" not in k
    }
    if leftovers:
        raise KeyError(f"torch keys not consumed: {sorted(leftovers)[:10]} ...")
    return result


def _to_numpy(obj):
    """Recursively convert torch tensors to numpy inside nested containers
    (optimizer state_dicts nest {'state': {idx: {...tensors}}, 'param_groups')."""
    if hasattr(obj, "detach"):
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy(v) for v in obj)
    return obj


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference `.pth.tar` checkpoint into numpy structures keyed by
    entry name ('generator', ..., 'optimizer_generator', ..., 'epoch', 'it').

    Model entries become flat {key: ndarray} state_dicts; optimizer entries
    keep the torch Adam nesting ({'state': {idx: {'step','exp_avg',
    'exp_avg_sq'}}, 'param_groups': [...]}) with tensors as numpy."""
    import torch

    cpk = torch.load(path, map_location="cpu", weights_only=False)
    return {name: _to_numpy(value) for name, value in cpk.items()}


_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def import_adam_state(
    params_template: Mapping[str, Any],
    model_state_dict: Mapping[str, np.ndarray],
    opt_state_dict: Mapping[str, Any],
):
    """Convert one torch Adam optimizer state_dict into (step, mu, nu) for our
    optax state, so training resumed from a reference checkpoint keeps its
    Adam moments (reference logger.py:49-66 restores the three optimizers;
    consumed at reference train.py:84-90).

    torch's Adam state is keyed by parameter INDEX in `model.parameters()`
    order, which is the parameter-entry order of the model's state_dict
    (buffers excluded) — the reference builds each optimizer directly over
    `model.parameters()` (reference train.py:81-83). Each entry's
    exp_avg/exp_avg_sq has the parameter's torch layout, so the same
    name translation + layout transform as the weights applies.

    Returns (step, mu, nu): step int, mu/nu pytrees shaped like
    `params_template`. Parameters the torch run never stepped (no state
    entry) get zero moments — torch's own lazy-init behavior.
    """
    param_keys = [
        k for k in model_state_dict if not k.endswith(_BUFFER_SUFFIXES)
    ]
    order: list = []
    for group in opt_state_dict["param_groups"]:
        order.extend(group["params"])
    if len(order) != len(param_keys):
        raise ValueError(
            f"optimizer covers {len(order)} params but the model state_dict "
            f"has {len(param_keys)} parameter entries"
        )
    idx_of_key = dict(zip(param_keys, order))
    state = opt_state_dict.get("state", {})
    steps = [int(np.asarray(s["step"])) for s in state.values()]
    step = max(steps) if steps else 0

    flat = flatten_dict(params_template)
    mu_flat: Dict[Any, np.ndarray] = {}
    nu_flat: Dict[Any, np.ndarray] = {}
    for path, value in flat.items():
        key = _flax_path_to_torch_key(path, "params")
        if key not in idx_of_key:
            raise KeyError(
                f"no torch parameter for flax params:{'/'.join(path)} "
                f"(expected '{key}')"
            )
        entry = state.get(idx_of_key[key])
        shape = np.shape(value)
        dtype = np.asarray(value).dtype
        if entry is None:
            mu_flat[path] = np.zeros(shape, dtype)
            nu_flat[path] = np.zeros(shape, dtype)
        else:
            mu_flat[path] = _convert_tensor(entry["exp_avg"], shape).astype(dtype)
            nu_flat[path] = _convert_tensor(entry["exp_avg_sq"], shape).astype(dtype)
    return step, unflatten_dict(mu_flat), unflatten_dict(nu_flat)
