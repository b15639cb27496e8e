"""CLI entry point: BiRefNet inference on an image.

The TPU-native equivalent of the reference's `infer_image` example
(reference: examples/infer_image.rs): load weights, preprocess, forward,
sigmoid, resize mask back, save. The host only decodes/encodes the image
bytes; resize/normalize/sigmoid/mask-resize run on device in one jitted
program (see pipeline.py).

Usage:
  python -m birefnet_tpu.cli photo.jpg mask.png --checkpoint model.safetensors

Flags replace the reference's cargo features / env vars:
  --no-flash   disable the Pallas flash-attention kernel
               (reference's DISABLE_FLASH_ATTN env var, src/swin.rs:228 —
               the env var is honored here too)
  --no-pallas-deform  disable the Pallas deformable-conv kernel
  --dtype      float32 | bfloat16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def default_checkpoint_path() -> str | None:
    """Look for the HF-hub cached ZhengPeng7/BiRefNet snapshot the reference
    downloads (reference: examples/infer_image.rs:30-32,
    examples/bench_inference.rs:19-20)."""
    root = os.path.expanduser(
        "~/.cache/huggingface/hub/models--ZhengPeng7--BiRefNet/snapshots")
    if os.path.isdir(root):
        for snap in sorted(os.listdir(root)):
            cand = os.path.join(root, snap, "model.safetensors")
            if os.path.exists(cand):
                return cand
    return None


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="BiRefNet dichotomous image segmentation (TPU-native)")
    parser.add_argument("image", help="input image path")
    parser.add_argument("output", nargs="?", default="output_mask.png",
                        help="output mask path (default: output_mask.png)")
    parser.add_argument("--checkpoint", default=None,
                        help="path to model.safetensors "
                             "(default: HF cache if present)")
    parser.add_argument("--size", type=int, default=1024,
                        help="inference resolution (default 1024)")
    parser.add_argument("--dtype", choices=("float32", "bfloat16"),
                        default="float32")
    parser.add_argument("--no-flash", action="store_true",
                        help="disable the Pallas flash-attention kernel")
    parser.add_argument("--no-pallas-deform", action="store_true",
                        help="disable the Pallas deformable-conv kernel")
    parser.add_argument("--deform-mode",
                        choices=("deformable", "deformable-local", "regular"),
                        default="deformable",
                        help="deformable = true sampling (reference Metal "
                             "path); deformable-local = true sampling with "
                             "offsets clamped +-4 px, ~4x faster on TPU "
                             "(MXU one-hot sampler); regular = "
                             "candle-CPU-compat plain conv")
    parser.add_argument("--backbone",
                        choices=("swin_v1_t", "swin_v1_s", "swin_v1_b",
                                 "swin_v1_l"),
                        default="swin_v1_l",
                        help="Swin backbone preset (default: swin_v1_l, the "
                             "published ZhengPeng7 checkpoint's). Non-L "
                             "variants use the generic channel derivation "
                             "(BiRefNetConfig.for_backbone) and need a "
                             "matching checkpoint")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU execution")
    args = parser.parse_args(argv)

    ckpt = args.checkpoint or default_checkpoint_path()
    if ckpt is None:
        # Fetch like the reference does (reference:
        # examples/infer_image.rs:30-32): hf-hub download, cached after the
        # first run. See hub.py; offline environments get an actionable error.
        from birefnet_tpu import hub
        try:
            print(f"Downloading {hub.DEFAULT_REPO}/{hub.DEFAULT_FILE} ...")
            ckpt = hub.download()
        except hub.HubUnavailableError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import birefnet_tpu as bt
    from birefnet_tpu import pipeline

    on_tpu = jax.default_backend() == "tpu"
    use_flash = (on_tpu and not args.no_flash
                 and "DISABLE_FLASH_ATTN" not in os.environ)
    compute = bt.ComputeConfig(
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        use_flash_attention=use_flash,
        use_pallas_deform=on_tpu and not args.no_pallas_deform,
        deform_mode=args.deform_mode,
        unroll_deep_stage=on_tpu,
    )
    cfg = bt.BiRefNetConfig.for_backbone(args.backbone)
    if args.size != 1024:
        import dataclasses
        cfg = dataclasses.replace(cfg, size=(args.size, args.size))

    print(f"Loading model from {ckpt} ...")
    params = bt.load_checkpoint(ckpt, cfg)

    from PIL import Image
    img = Image.open(args.image).convert("RGB")
    orig_w, orig_h = img.size
    print(f"Input: {args.image} ({orig_w}x{orig_h})")

    frames = jnp.asarray(np.asarray(img, dtype=np.uint8))[None]  # [1,H,W,3]
    if on_tpu:
        # Staged compilation: the monolithic 1024^2 program is a very large
        # XLA compile; the staged path is numerically identical (see
        # staged.py) and compiles in minutes.
        from birefnet_tpu import staged
        infer = staged.make_staged_infer_fn(params, cfg, compute)
    else:
        infer = pipeline.make_infer_fn(params, cfg, compute)

    print("Running inference...")
    t0 = time.time()
    mask = np.asarray(infer(frames))  # readback = reliable fence
    print(f"Inference time (incl. compile): {time.time() - t0:.2f}s")
    t0 = time.time()
    mask = np.asarray(infer(frames))
    print(f"Inference time (steady state): {time.time() - t0:.3f}s")

    # Health-check stats like the reference (reference:
    # examples/infer_image.rs:79-90).
    m = np.asarray(mask[0], dtype=np.float32) / 255.0
    print(f"Mask stats - min: {m.min():.4f}, max: {m.max():.4f}, "
          f"mean: {m.mean():.4f}")

    Image.fromarray(np.asarray(mask[0])).save(args.output)
    print(f"Saved mask to: {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
