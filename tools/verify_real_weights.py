#!/usr/bin/env python
"""Real-weights verification: one command for the first networked run.

Everything numerical in this repo is currently validated against a
self-authored torch oracle on random checkpoints (egress to huggingface.co
is blocked in the dev environment — see README). This script makes the
first run with the REAL ZhengPeng7/BiRefNet checkpoint turnkey
(reference: examples/infer_image.rs:30-40):

  1. resolves the checkpoint (--checkpoint path, else the HF cache, else
     a fresh download via birefnet_tpu.hub with ETag-validated resume),
  2. runs the framework (staged pipeline at --dtype) AND the torch oracle
     on the same checkpoint + image,
  3. prints a per-stage diff table (backbone stages, logits) and the mask
     MAE vs the oracle, with PASS/FAIL gates (<1e-3 mask MAE, the
     BASELINE.md accuracy contract).

Usage:
  python tools/verify_real_weights.py [--checkpoint model.safetensors]
      [--image cat.png] [--size 1024] [--dtype float32|bfloat16] [--cpu]

With no --image a deterministic synthetic image is used; pass a real
photo for a qualitative mask check (written next to the image).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def resolve_checkpoint(arg_path):
    if arg_path:
        return arg_path
    from birefnet_tpu import hub
    cached = hub.cached_file()
    if cached:
        print(f"using cached checkpoint {cached}")
        return cached
    print(f"downloading {hub.DEFAULT_REPO}/{hub.DEFAULT_FILE} ...")
    return hub.download()


def load_image(path, size):
    if path:
        from birefnet_tpu.loader import load_frame
        frame, (oh, ow) = load_frame(path, size)
        return frame[None], (oh, ow)
    rng = np.random.default_rng(7)
    # Deterministic synthetic: smooth blobs, not pure noise (exercises the
    # full dynamic range like a real photo).
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack([
        0.5 + 0.5 * np.sin(6.0 * yy + 2.0 * xx),
        0.5 + 0.5 * np.cos(4.0 * xx),
        0.5 + 0.5 * np.sin(3.0 * (xx + yy)),
    ], axis=-1)
    img = (img * 255 + rng.normal(0, 4, img.shape)).clip(0, 255)
    return img.astype(np.uint8)[None], (size, size)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--image", default=None)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="bfloat16")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--deform-mode", default="deformable",
                   choices=("deformable", "deformable-local", "regular"),
                   help="deformable = the reference Metal-path semantics "
                   "(the real model); the oracle always runs deformable")
    p.add_argument("--skip-oracle", action="store_true",
                   help="framework-only run (oracle at 1024^2 is slow on "
                   "a small host)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import dataclasses
    import birefnet_tpu as bt
    from birefnet_tpu import staged
    from birefnet_tpu.models import swin as bswin
    from birefnet_tpu import pipeline

    ckpt = resolve_checkpoint(args.checkpoint)
    print(f"loading {ckpt} ...")
    from safetensors import safe_open
    tensors = {}
    with safe_open(ckpt, framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)

    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(),
                              size=(args.size, args.size))
    params = jax.tree.map(jnp.asarray, bt.build_param_tree(tensors, cfg))
    print(f"checkpoint schema OK ({len(tensors)} tensors, strict coverage)")

    on_tpu = jax.default_backend() == "tpu"
    compute = bt.ComputeConfig(
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        use_flash_attention=on_tpu and "DISABLE_FLASH_ATTN" not in os.environ,
        use_pallas_deform=on_tpu,
        deform_mode=args.deform_mode,
        unroll_deep_stage=on_tpu,
    )
    frames, (oh, ow) = load_image(args.image, args.size)
    print(f"backend={jax.default_backend()} dtype={args.dtype} "
          f"deform_mode={args.deform_mode} size={args.size}")

    # ---- Framework: staged pipeline, float mask out ----
    infer = staged.make_staged_infer_fn(
        params, cfg, compute, out_size=(args.size, args.size),
        as_uint8=False)
    mask = np.asarray(infer(jnp.asarray(frames)), np.float32)
    print(f"framework mask: shape={mask.shape} min={mask.min():.4f} "
          f"max={mask.max():.4f} mean={mask.mean():.5f}")

    if args.image:
        from PIL import Image
        out_path = os.path.splitext(args.image)[0] + "_mask_verify.png"
        Image.fromarray((mask[0] * 255).astype(np.uint8)).save(out_path)
        print(f"wrote {out_path}")

    if args.skip_oracle:
        print("(oracle skipped)")
        return 0

    # ---- Torch oracle on the SAME checkpoint + preprocessed input ----
    import torch
    from torch_ref import birefnet_torch as tref
    tm = tref.BiRefNetTorch()
    tref.load_flat_checkpoint(tm, tensors)

    x = np.asarray(
        pipeline.preprocess(jnp.asarray(frames), cfg.size,
                            dtype=jnp.float32), np.float32)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)

    print("=== per-stage diffs (framework f32 vs oracle) ===")
    feats = bswin.swin_forward(params["bb"], cfg.swin_config(),
                               jnp.asarray(x))
    with torch.no_grad():
        tfeats = tm.bb(tx)
    for i, (f, tf) in enumerate(zip(feats, tfeats)):
        f_np = np.asarray(f, np.float32)
        t_np = tf.permute(0, 2, 3, 1).numpy()
        d = np.abs(f_np - t_np)
        print(f"stage{i + 1}: shape={f_np.shape} max|diff|={d.max():.3e} "
              f"mean|diff|={d.mean():.3e}")

    with torch.no_grad():
        tlogits = tm.forward_logits(tx).permute(0, 2, 3, 1).numpy()
    tmask = 1.0 / (1.0 + np.exp(-tlogits[..., 0]))
    mae = np.abs(mask - tmask).mean()
    print(f"mask MAE vs oracle = {mae:.3e} (gate < 1e-3: "
          f"{'PASS' if mae < 1e-3 else 'FAIL'})")
    return 0 if mae < 1e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
