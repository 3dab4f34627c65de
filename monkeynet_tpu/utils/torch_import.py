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


def load_torch_checkpoint(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Load a reference `.pth.tar` checkpoint into numpy state_dicts keyed by
    model name ('generator', 'kp_detector', 'discriminator', ...)."""
    import torch

    cpk = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for name, value in cpk.items():
        if isinstance(value, dict):
            out[name] = {
                k: v.detach().cpu().numpy()
                for k, v in value.items()
                if hasattr(v, "detach")
            }
        else:
            out[name] = value  # epoch / it counters
    return out
