"""Finetuning CLI: directory of (image, mask) pairs -> trained checkpoint.

The reference is inference-only; this driver completes the training
subsystem (train.py) into an end-to-end tool: it pairs images with
same-stem masks, runs the structure-loss AdamW train step (optionally
FSDP-sharded over a data-parallel mesh), and exports the result back to
the ZhengPeng7 torch schema (params.save_checkpoint) — i.e. a checkpoint
the upstream torch model and the reference implementation can load.

Usage:
  python -m birefnet_tpu.finetune imgs/ masks/ --out trained.safetensors \
      --checkpoint model.safetensors --size 1024 --batch 2 --steps 100 \
      --dp 4 --save-state run_state.safetensors [--resume run_state.safetensors]

Masks are grayscale images; any stem match counts (img0.jpg <-> img0.png).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def find_pairs(images_dir: str, masks_dir: str):
    """Pair image files with same-stem mask files (sorted, strict)."""
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
    masks = {}
    for f in os.listdir(masks_dir):
        stem, ext = os.path.splitext(f)
        if ext.lower() in exts:
            masks[stem] = os.path.join(masks_dir, f)
    pairs = []
    for f in sorted(os.listdir(images_dir)):
        stem, ext = os.path.splitext(f)
        if ext.lower() not in exts:
            continue
        if stem not in masks:
            raise FileNotFoundError(
                f"no mask with stem {stem!r} in {masks_dir} for image {f}")
        pairs.append((os.path.join(images_dir, f), masks[stem]))
    if not pairs:
        raise FileNotFoundError(f"no images found in {images_dir}")
    return pairs


def load_mask(path: str, size: int) -> np.ndarray:
    """Grayscale mask -> [size, size] float32 in [0, 1] (triangle resize,
    same filter family as the image side)."""
    from PIL import Image

    from .utils import native

    m = np.asarray(Image.open(path).convert("L"))
    if m.shape != (size, size):
        m = native.resize_triangle_u8(
            np.repeat(m[..., None], 3, axis=-1), size, size)[..., 0]
    return m.astype(np.float32) / 255.0


def _batches(pairs, batch: int, size: int, steps: int, seed: int = 0,
             flip: bool = False):
    """Infinite shuffled epochs of (frames_u8 [B,s,s,3], masks [B,s,s]).

    flip=True applies a per-sample random horizontal flip to image and
    mask jointly (the upstream BiRefNet training augmentation). The flip
    draws come from an independent stream so the sample SELECTION is
    identical with and without augmentation."""
    from .loader import load_frame

    rng = np.random.default_rng(seed)
    frng = np.random.default_rng(seed + 0x5F11)
    idx, pos = rng.permutation(len(pairs)), 0
    for _ in range(steps):
        take = []
        while len(take) < batch:
            if pos == len(idx):
                idx, pos = rng.permutation(len(pairs)), 0
            take.append(pairs[int(idx[pos])])
            pos += 1
        frames = np.stack([load_frame(ip, size)[0] for ip, _ in take])
        masks = np.stack([load_mask(mp, size) for _, mp in take])
        if flip:
            sel = frng.random(batch) < 0.5
            frames[sel] = frames[sel, :, ::-1]
            masks[sel] = masks[sel, :, ::-1]
        yield frames, masks


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Finetune BiRefNet on (image, mask) pairs (TPU-native)")
    parser.add_argument("images_dir")
    parser.add_argument("masks_dir")
    parser.add_argument("--out", required=True,
                        help="output checkpoint (torch schema safetensors)")
    parser.add_argument("--checkpoint", default=None,
                        help="initial weights (default: random init)")
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--backbone",
                        choices=("swin_v1_t", "swin_v1_s", "swin_v1_b",
                                 "swin_v1_l"),
                        default="swin_v1_l",
                        help="Swin backbone preset; non-L variants train "
                             "the generic-derivation model family "
                             "(BiRefNetConfig.for_backbone)")
    parser.add_argument("--batch", type=int, default=1,
                        help="frames per optimizer step (with --accum-steps "
                             "k this is the EFFECTIVE batch; k microbatches "
                             "of batch/k run sequentially)")
    parser.add_argument("--accum-steps", type=int, default=1,
                        help="gradient accumulation: sequential microbatch "
                             "fwd+bwd passes per update (activation memory "
                             "of batch/accum_steps)")
    parser.add_argument("--augment-flip", action="store_true",
                        help="random horizontal flip (image+mask jointly), "
                             "the upstream BiRefNet training augmentation")
    parser.add_argument("--remat", action="store_true",
                        help="gradient-checkpoint the Swin blocks "
                             "(rematerialize activations in the backward: "
                             "~stage-depth x less activation HBM for one "
                             "extra forward)")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--backbone-lr-scale", type=float, default=1.0,
                        help="LR multiplier for the Swin backbone vs the "
                             "decoder (0 freezes the backbone)")
    parser.add_argument("--weight-decay", type=float, default=1e-2)
    parser.add_argument("--schedule", choices=("constant", "cosine"),
                        default="constant",
                        help="cosine = linear warmup + cosine decay over "
                             "--steps")
    parser.add_argument("--warmup-steps", type=int, default=0)
    parser.add_argument("--dtype", choices=("float32", "bfloat16"),
                        default="float32",
                        help="activation compute dtype request; training "
                             "always runs float32 (bfloat16 is demoted — "
                             "see train.validate_train_compute)")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel mesh size (params/moments "
                             "FSDP-sharded, batch sharded)")
    parser.add_argument("--save-state", default=None,
                        help="also save resumable train state here "
                             "(params + AdamW moments + step)")
    parser.add_argument("--resume", default=None,
                        help="resume from a --save-state file")
    parser.add_argument("--log-every", type=int, default=1)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from . import params as P
    from . import pipeline, train
    from .configs import BiRefNetConfig, ComputeConfig

    cfg = BiRefNetConfig.for_backbone(args.backbone)
    if cfg.size != (args.size, args.size):
        import dataclasses
        cfg = dataclasses.replace(cfg, size=(args.size, args.size))
    compute = train.validate_train_compute(
        ComputeConfig(dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                      else jnp.float32,
                      remat_blocks=args.remat))
    if args.batch % args.accum_steps:
        raise ValueError(f"--batch {args.batch} not divisible by "
                         f"--accum-steps {args.accum_steps}")
    tcfg = train.TrainConfig(learning_rate=args.lr,
                             weight_decay=args.weight_decay,
                             schedule=args.schedule,
                             warmup_steps=args.warmup_steps,
                             total_steps=args.steps,
                             accum_steps=args.accum_steps,
                             backbone_lr_scale=args.backbone_lr_scale)

    pairs = find_pairs(args.images_dir, args.masks_dir)
    print(f"{len(pairs)} image/mask pairs; batch {args.batch}, "
          f"{args.steps} steps @ {args.size}^2 "
          f"{jnp.dtype(compute.dtype).name}", flush=True)

    params = (P.load_checkpoint(args.checkpoint, cfg)
              if args.checkpoint else P.init_params(cfg, seed=0))

    in_sharding = param_sharding = None
    if args.dp > 1:
        from .parallel import mesh as pmesh
        from .parallel import sharding as pshard
        if (args.batch // args.accum_steps) % args.dp:
            raise ValueError(
                f"microbatch {args.batch // args.accum_steps} "
                f"(--batch/--accum-steps) not divisible by --dp {args.dp}")
        mesh = pmesh.make_mesh(args.dp, spatial=1)
        param_sharding = pshard.fsdp_specs(params, mesh)
        params = jax.device_put(params, param_sharding)
        in_sharding = pshard.batch_leading(mesh)

    state = train.init_train_state(params, tcfg)
    if args.resume:
        state = train.load_train_state(args.resume, state)
        if args.dp > 1:
            # Re-apply the mesh shardings (the file is host-flat).
            from .parallel import sharding as pshard
            state = train.TrainState(
                params=jax.device_put(
                    state.params, pshard.fsdp_specs(state.params, mesh)),
                opt_state=jax.device_put(
                    state.opt_state,
                    pshard.fsdp_specs(state.opt_state, mesh)),
                step=state.step)
        print(f"resumed at step {int(state.step)}", flush=True)

    step_fn = train.make_train_step(cfg, compute, tcfg,
                                    in_sharding=in_sharding,
                                    param_sharding=param_sharding)

    @jax.jit
    def prep(frames_u8):
        return pipeline.preprocess(frames_u8, cfg.size, dtype=compute.dtype)

    t0 = time.time()
    for i, (frames, masks) in enumerate(
            _batches(pairs, args.batch, args.size, args.steps,
                     flip=args.augment_flip)):
        x = prep(jnp.asarray(frames))
        y = jnp.asarray(masks)
        if in_sharding is not None:
            x = jax.device_put(x, in_sharding)
            y = jax.device_put(y, in_sharding)
        state, metrics = step_fn(state, x, y)
        if i % args.log_every == 0 or i == args.steps - 1:
            print(f"step {int(state.step):5d}  "
                  f"loss {float(metrics['loss']):.4f}  "
                  f"grad_norm {float(metrics['grad_norm']):.3e}  "
                  f"{time.time() - t0:.1f}s", flush=True)

    if args.save_state:
        train.save_train_state(args.save_state, state)
        print(f"train state -> {args.save_state}", flush=True)
    P.save_checkpoint(args.out, jax.device_get(state.params), cfg)
    print(f"checkpoint (torch schema) -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
