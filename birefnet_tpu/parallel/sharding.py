"""Sharding specs and sharded inference steps.

Batch data parallelism for throughput (the analog of the reference's batch-8
bench config) and spatial activation sharding for high-resolution variants.
Collectives are inserted by XLA from sharding annotations — the TPU-native
replacement for the reference's "no communication backend at all"
(SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import BiRefNetConfig, ComputeConfig
from ..models import birefnet
from .mesh import DATA_AXIS, SPATIAL_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, None, None, None))


def batch_leading(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding valid for any rank >= 1 — for pytrees
    that mix NHWC activations with rank-3 masks (a spec shorter than the
    value's rank leaves the remaining dims unsharded)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_spatial_sharded(mesh: Mesh) -> NamedSharding:
    """NHWC sharding: batch over data axis, H over spatial axis."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))


def fsdp_specs(params, mesh: Mesh, axis: str = DATA_AXIS,
               min_size: int = 2 ** 14):
    """ZeRO-3/FSDP leaf shardings: shard each parameter's LARGEST dimension
    that divides by the axis size; replicate leaves that are too small or
    indivisible.

    This is the TPU-native parameter/optimizer partitioning for training
    (train.py): params, grads, and AdamW moments all carry these specs, and
    XLA inserts the all-gather (params into the forward) and reduce-scatter
    (grads out of the backward) collectives from the annotations alone.
    `min_size` keeps tiny leaves (biases, LN scales) replicated — sharding
    them costs more in collective latency than it saves in bytes.

    Returns a pytree of NamedSharding matching `params`' structure (usable
    for the optimizer state too: optax's AdamW moments mirror the params
    tree, so `jax.tree.map`-ing device_put with these specs over `mu`/`nu`
    shards them identically).
    """
    n = mesh.shape[axis]

    def spec_for(leaf) -> NamedSharding:
        shape = getattr(leaf, "shape", ())
        size = 1
        for d in shape:
            size *= d
        if not shape or size < min_size:
            return NamedSharding(mesh, P())
        # Largest divisible dim; ties break toward the LAST dim (params here
        # are torch-layout conv [kh, kw, cin, cout] / dense [in, out]: the
        # trailing dims are the big channel dims).
        best = None
        for i, d in enumerate(shape):
            if d % n == 0 and (best is None or d >= shape[best]):
                best = i
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(spec_for, params)


def make_sharded_infer_fn(
    mesh: Mesh,
    params,
    cfg: BiRefNetConfig,
    compute: ComputeConfig = ComputeConfig(),
    spatial: bool = True,
    as_uint8: bool = True,
):
    """Mesh-sharded uint8-in -> mask-out inference (the HR-variant serving
    path; BASELINE.json config: "2048x2048, activations sharded across a
    v5e-8 mesh").

    Frames are sharded batch-over-`data` and H-over-`spatial`; params are
    replicated; XLA inserts halo-exchange collectives for convs/windows from
    the annotations (the explicit shard_map formulation lives in halo.py).
    """
    from .. import pipeline

    in_spec = (batch_spatial_sharded(mesh) if spatial
               else batch_sharded(mesh))

    @jax.jit
    def infer(params, frames_u8):
        b, h, w, _ = frames_u8.shape
        x = pipeline.preprocess(frames_u8, cfg.size, dtype=compute.dtype)
        x = jax.lax.with_sharding_constraint(x, in_spec)
        mask = birefnet.forward(params, cfg, x, compute)
        return pipeline.postprocess(mask, h, w, as_uint8=as_uint8)

    def run(frames_u8):
        f = jax.device_put(frames_u8, in_spec)
        p = jax.device_put(params, replicated(mesh))
        return infer(p, f)

    return run


def make_data_parallel_forward(
    mesh: Mesh,
    cfg: BiRefNetConfig,
    compute: ComputeConfig = ComputeConfig(),
    logits: bool = False,
    spatial: bool = False,
):
    """jit-compiled forward with batch-DP (optionally + spatial) sharding.

    Params are replicated (Swin-L fits comfortably in one chip's HBM);
    activations are sharded over the mesh. XLA inserts the collectives
    (halo exchanges for convs/windows on the spatial axis) automatically
    from the annotations.
    """
    fn = birefnet.forward_logits if logits else birefnet.forward
    in_sharding = batch_spatial_sharded(mesh) if spatial else batch_sharded(mesh)

    @functools.partial(
        jax.jit,
        static_argnums=(),
        in_shardings=(replicated(mesh), in_sharding),
        out_shardings=in_sharding,
    )
    def step(params, x):
        return fn(params, cfg, x, compute)

    return step
