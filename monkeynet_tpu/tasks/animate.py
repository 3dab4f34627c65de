"""Frame-batched inference: whole videos through one compiled program.

The reference animates frame-by-frame in a Python loop (reconstruction.py:
12-25, transfer.py:72-74) — one tiny GPU launch per frame. Every frame is
independent given its keypoints, so here the generator consumes ALL driving
keypoints at once (the frame axis folds into the conv batch) and long videos
are processed in fixed-size chunks so XLA compiles exactly one program per
(chunk, resolution) instead of one per video length.

All chunk outputs stay ON DEVICE and are concatenated there; callers pull the
result across the host boundary once per video (device->host roundtrips cost
~0.5s each on tunneled TPU backends, so per-chunk fetches would dominate).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


def _pad_kp(kp: Dict, total: int) -> Dict:
    """Pad the frame axis to `total` by repeating the last frame."""
    d = kp["mean"].shape[1]
    if d == total:
        return kp
    reps = total - d
    return {
        k: jnp.concatenate([v, jnp.repeat(v[:, -1:], reps, axis=1)], axis=1)
        for k, v in kp.items()
    }


def _bucket(n: int, chunk: int, granularity: int = 16) -> int:
    """Static frame-count bucket: videos shorter than the chunk are padded to
    a multiple of `granularity` so XLA compiles one program per BUCKET, not
    one per unique video length (gif datasets have ragged lengths). When the
    frame axis is sharded over a mesh, granularity is lcm(16, mesh size) so
    every bucket divides the mesh."""
    if n >= chunk:
        return chunk
    return min(chunk, -(-n // granularity) * granularity)


def _mesh_granularity(mesh) -> int:
    if mesh is None:
        return 16
    return int(np.lcm(16, mesh.size))


def _mesh_shardings(mesh):
    """(replicated, frame-sharded) NamedShardings for a 1-D data mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P()), NamedSharding(mesh, P(None, "data"))


def _pad_frames(frames, total: int):
    n = frames.shape[1]
    if n == total:
        return frames
    return jnp.concatenate(
        [frames, jnp.repeat(frames[:, -1:], total - n, axis=1)], axis=1
    )


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


class Animator:
    """generator.apply over fixed-size kp chunks, jit-cached, device-resident.

    dtype=jnp.bfloat16 runs the conv/warp path in bf16 on the MXU (params and
    activations cast inside the program; outputs returned float32). BN eval
    statistics stay float32 internally.
    """

    def __init__(self, generator, variables, chunk: int = 128, dtype=None,
                 mesh=None):
        self.generator = generator
        self.granularity = _mesh_granularity(mesh)
        self.chunk = -(-chunk // self.granularity) * self.granularity
        if mesh is not None:
            # Params placed (replicated) ONCE at construction; per-call inputs
            # shard the frame axis over 'data' and GSPMD partitions the
            # generator — the idiomatic DataParallel-eval equivalent
            # (reference reconstruction.py:45-46).
            self._replicated, self._frame_sharded = _mesh_shardings(mesh)
            self.variables = jax.device_put(variables, self._replicated)
        else:
            self._replicated = self._frame_sharded = None
            self.variables = variables

        @jax.jit
        def _run(variables, source, kp_driving, kp_source):
            if dtype is not None:
                variables = _cast_floats(variables, dtype)
                source = source.astype(dtype)
                kp_driving = _cast_floats(kp_driving, dtype)
                kp_source = _cast_floats(kp_source, dtype)
            out = generator.apply(
                variables, source, kp_driving, kp_source, train=False
            )
            return _cast_floats(out, jnp.float32) if dtype is not None else out

        self._run = _run

    def __call__(self, source, kp_driving, kp_source) -> Dict[str, np.ndarray]:
        """source (B,1,H,W,C); kp_driving (B,D,...); returns numpy videos
        {'video_prediction', 'video_deformed'} (one host fetch per key)."""
        out = self.device_call(source, kp_driving, kp_source)
        return {k: np.asarray(v) for k, v in out.items()}

    def device_call(self, source, kp_driving, kp_source) -> Dict[str, jax.Array]:
        kp_driving = {k: jnp.asarray(v) for k, v in kp_driving.items()}
        kp_source = {k: jnp.asarray(v) for k, v in kp_source.items()}
        if self._replicated is not None:
            source = jax.device_put(jnp.asarray(source), self._replicated)
            kp_source = jax.device_put(kp_source, self._replicated)
        d = kp_driving["mean"].shape[1]
        chunk = self.chunk
        outs = {"video_prediction": [], "video_deformed": []}
        for start in range(0, d, chunk):
            part = {k: v[:, start : start + chunk] for k, v in kp_driving.items()}
            n_valid = part["mean"].shape[1]
            part = _pad_kp(part, _bucket(n_valid, chunk, self.granularity))
            if self._frame_sharded is not None:
                part = jax.device_put(part, self._frame_sharded)
            out = self._run(self.variables, source, part, kp_source)
            for k in outs:
                outs[k].append(out[k][:, :n_valid])
        if len(outs["video_prediction"]) == 1:
            return {k: v[0] for k, v in outs.items()}
        return {k: jnp.concatenate(v, axis=1) for k, v in outs.items()}


class TransferEngine:
    """Whole transfer pipeline — driving-kp detection, relative-move keypoint
    normalization, and generation — as ONE compiled program per frame chunk.

    Collapses the per-video dispatch count to ceil(D/chunk): on remote/tunneled
    TPU backends each dispatch costs tens of ms of latency, so fusing the
    kp-detector and generator programs nearly halves wall-clock vs running
    them as separate chunked programs.

    Covers the default normalization recipe (move_location / clip_mean, which
    are pure tensor ops — reference transfer.py:42-50). Convex-hull scale
    adaptation and covariance eigendecomposition are host-side math; use
    tasks/transfer.transfer_one for configs that enable them.
    """

    def __init__(self, generator, kp_detector, gen_vars, kp_vars,
                 chunk: int = 128, dtype=None, move_location: bool = True,
                 clip_mean: bool = False, mesh=None):
        self.granularity = _mesh_granularity(mesh)
        self.chunk = -(-chunk // self.granularity) * self.granularity
        if mesh is not None:
            self._replicated, self._frame_sharded = _mesh_shardings(mesh)
            gen_vars = jax.device_put(gen_vars, self._replicated)
            kp_vars = jax.device_put(kp_vars, self._replicated)
        else:
            self._replicated = self._frame_sharded = None
        self.gen_vars = gen_vars
        self.kp_vars = kp_vars

        def _normalize(kp_chunk, kp_first, kp_source):
            if not move_location:
                return kp_chunk
            out = dict(kp_chunk)
            out["mean"] = kp_chunk["mean"] - kp_first["mean"] + kp_source["mean"]
            if clip_mean:
                out["mean"] = jnp.clip(out["mean"], -1.0, 1.0)
            return out

        @jax.jit
        def _first(gen_vars, kp_vars, source, frames):
            if dtype is not None:
                gen_vars = _cast_floats(gen_vars, dtype)
                kp_vars = _cast_floats(kp_vars, dtype)
                source = source.astype(dtype)
                frames = frames.astype(dtype)
            kp_source = kp_detector.apply(kp_vars, source, False)
            kp_chunk = kp_detector.apply(kp_vars, frames, False)
            kp_first = {k: v[:, :1] for k, v in kp_chunk.items()}
            kp_norm = _normalize(kp_chunk, kp_first, kp_source)
            out = generator.apply(gen_vars, source, kp_norm, kp_source, train=False)
            state = (kp_source, kp_first)
            res = (out, kp_chunk, kp_norm, state)
            return _cast_floats(res, jnp.float32) if dtype is not None else res

        @jax.jit
        def _next(gen_vars, kp_vars, source, frames, state):
            if dtype is not None:
                gen_vars = _cast_floats(gen_vars, dtype)
                kp_vars = _cast_floats(kp_vars, dtype)
                source = source.astype(dtype)
                frames = frames.astype(dtype)
                state = _cast_floats(state, dtype)
            kp_source, kp_first = state
            kp_chunk = kp_detector.apply(kp_vars, frames, False)
            kp_norm = _normalize(kp_chunk, kp_first, kp_source)
            out = generator.apply(gen_vars, source, kp_norm, kp_source, train=False)
            res = (out, kp_chunk, kp_norm)
            return _cast_floats(res, jnp.float32) if dtype is not None else res

        self._first = _first
        self._next = _next

    def __call__(self, source, driving):
        """source (B,1,H,W,C), driving (B,D,H,W,C) -> dict of device arrays
        {'video_prediction','video_deformed','kp_driving','kp_source','kp_norm'}."""
        source = jnp.asarray(source)
        driving = jnp.asarray(driving)
        if self._replicated is not None:
            source = jax.device_put(source, self._replicated)
        d = driving.shape[1]
        chunk = self.chunk

        preds, defs, kps, norms = [], [], [], []
        state = None
        kp_source = None
        for start in range(0, d, chunk):
            frames = driving[:, start : start + chunk]
            n_valid = frames.shape[1]
            frames = _pad_frames(frames, _bucket(n_valid, chunk, self.granularity))
            if self._frame_sharded is not None:
                frames = jax.device_put(frames, self._frame_sharded)
            if state is None:
                out, kp_chunk, kp_norm, state = self._first(
                    self.gen_vars, self.kp_vars, source, frames
                )
                kp_source = state[0]
            else:
                out, kp_chunk, kp_norm = self._next(
                    self.gen_vars, self.kp_vars, source, frames, state
                )
            preds.append(out["video_prediction"][:, :n_valid])
            defs.append(out["video_deformed"][:, :n_valid])
            kps.append({k: v[:, :n_valid] for k, v in kp_chunk.items()})
            norms.append({k: v[:, :n_valid] for k, v in kp_norm.items()})

        cat = (
            (lambda xs: xs[0])
            if len(preds) == 1
            else (lambda xs: jnp.concatenate(xs, axis=1))
        )
        return {
            "video_prediction": cat(preds),
            "video_deformed": cat(defs),
            "kp_driving": {k: cat([o[k] for o in kps]) for k in kps[0]},
            "kp_norm": {k: cat([o[k] for o in norms]) for k in norms[0]},
            "kp_source": kp_source,
        }


class KPExtractor:
    """kp detector over fixed-size frame chunks, jit-cached, device-resident."""

    def __init__(self, kp_detector, variables, chunk: int = 128, dtype=None,
                 mesh=None):
        self.kp_detector = kp_detector
        self.granularity = _mesh_granularity(mesh)
        self.chunk = -(-chunk // self.granularity) * self.granularity
        if mesh is not None:
            self._replicated, self._frame_sharded = _mesh_shardings(mesh)
            self.variables = jax.device_put(variables, self._replicated)
        else:
            self._replicated = self._frame_sharded = None
            self.variables = variables

        @jax.jit
        def _run(variables, frames):
            if dtype is not None:
                variables = _cast_floats(variables, dtype)
                frames = frames.astype(dtype)
            kp = kp_detector.apply(variables, frames, False)
            return _cast_floats(kp, jnp.float32) if dtype is not None else kp

        self._run = _run

    def __call__(self, video) -> Dict[str, np.ndarray]:
        """video (B, D, H, W, C) -> kp dict with numpy (B, D, K, ...)."""
        return {k: np.asarray(v) for k, v in self.device_call(video).items()}

    def device_call(self, video) -> Dict[str, jax.Array]:
        video = jnp.asarray(video)
        d = video.shape[1]
        chunk = self.chunk
        outs = []
        for start in range(0, d, chunk):
            part = video[:, start : start + chunk]
            n_valid = part.shape[1]
            part = _pad_frames(part, _bucket(n_valid, chunk, self.granularity))
            if self._frame_sharded is not None:
                part = jax.device_put(part, self._frame_sharded)
            kp = self._run(self.variables, part)
            outs.append({k: v[:, :n_valid] for k, v in kp.items()})
        if len(outs) == 1:
            return outs[0]
        return {k: jnp.concatenate([o[k] for o in outs], axis=1) for k in outs[0]}
