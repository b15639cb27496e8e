#!/usr/bin/env python
"""Real-weights verification: one command for the first networked run.

Everything numerical in this repo is currently validated against a
self-authored torch oracle on random checkpoints (egress to huggingface.co
is blocked in the dev environment — see README). This script makes the
first run with the REAL ZhengPeng7/BiRefNet checkpoint turnkey
(reference: examples/infer_image.rs:30-40):

  1. resolves the checkpoint (--checkpoint path, else the HF cache, else
     a fresh download via birefnet_tpu.hub with ETag-validated resume),
  2. probes the real weights' per-site max|offset| at all 20 deformable
     sites and prints the auto-calibrated per-site radii (THE open
     performance question only the real checkpoint can answer — small
     trained offsets let every site run the fast local kernel),
  3. runs the framework (staged pipeline at --dtype, default
     --deform-mode auto = per-site calibrated local dispatch) AND the
     torch oracle on the same checkpoint + image,
  4. prints a per-stage diff table (backbone stages, logits), a
     throughput measure at the resolved mode (on TPU), and the mask
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
    p.add_argument("--deform-mode", default="auto",
                   choices=("deformable", "deformable-local", "regular",
                            "auto"),
                   help="deformable = the reference Metal-path semantics "
                   "(the real model); auto (default) = probe the real "
                   "checkpoint's per-site max|offset| and serve each site "
                   "at its own calibrated local radius — exact w.r.t. the "
                   "probed data, so the oracle MAE gate still applies; the "
                   "oracle always runs deformable")
    p.add_argument("--skip-oracle", action="store_true",
                   help="framework-only run (oracle at 1024^2 is slow on "
                   "a small host)")
    p.add_argument("--throughput", type=int, default=None, metavar="N",
                   help="also measure img/s over N chained iters (default: "
                   "40 on TPU, skipped on CPU)")
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
        deform_mode=("deformable" if args.deform_mode == "auto"
                     else args.deform_mode),
        unroll_deep_stage=on_tpu,
    )
    frames, (oh, ow) = load_image(args.image, args.size)
    print(f"backend={jax.default_backend()} dtype={args.dtype} "
          f"deform_mode={args.deform_mode} size={args.size}")

    # ---- Per-site offset calibration: THE open question only the real
    # checkpoint can answer (are the trained offsets small enough for the
    # fast local kernel, and at which radius per site?) ----
    if args.deform_mode in ("deformable", "auto"):
        from birefnet_tpu import calibrate
        print("=== per-site |offset| probe (20 deformable sites) ===")
        maxima = calibrate.probe_offset_maxima(params, cfg,
                                               jnp.asarray(frames), compute)
        radii = calibrate.calibrated_site_radii(maxima)
        for name, m, r in zip(calibrate.SITE_NAMES, maxima, radii):
            pick = f"local R={r}" if r is not None else "exact (probe > cap)"
            print(f"  {name:16s} max|offset| = {float(m):7.3f}px -> {pick}")
        if args.deform_mode == "auto":
            live = [r for r in radii if r is not None]
            if live:
                compute = compute.with_overrides(
                    deform_mode="deformable-local", deform_site_radii=radii,
                    deform_local_radius=max(live))
            print(f"auto resolved -> {compute.deform_mode} "
                  f"site_radii={radii if live else None}")

    # ---- Framework: staged pipeline, float mask out ----
    infer = staged.make_staged_infer_fn(
        params, cfg, compute, out_size=(args.size, args.size),
        as_uint8=False)
    mask = np.asarray(infer(jnp.asarray(frames)), np.float32)
    print(f"framework mask: shape={mask.shape} min={mask.min():.4f} "
          f"max={mask.max():.4f} mean={mask.mean():.5f}")

    # ---- Throughput at the resolved mode (bench.py's chained-iters
    # protocol; the auto-mode number is the one ROADMAP's radius curve
    # predicts from the probed radii) ----
    iters = args.throughput if args.throughput is not None \
        else (40 if on_tpu else 0)
    if iters:
        import time
        framesd = jnp.asarray(frames)
        fence = jax.jit(lambda outs: sum(jnp.sum(o.astype(jnp.float32))
                                         for o in outs))
        float(fence([infer(framesd) for _ in range(iters)]))  # warm
        t0 = time.perf_counter()
        float(fence([infer(framesd) for _ in range(iters)]))
        dt = (time.perf_counter() - t0) / iters
        print(f"throughput ({compute.deform_mode}): "
              f"{frames.shape[0] / dt:.2f} img/s "
              f"({dt * 1e3:.1f} ms/iter over {iters} chained iters)")

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
