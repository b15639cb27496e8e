"""Batch serving entry point: segment a directory/list of images.

Production-shaped pipeline the reference lacks (its only app is a
single-image example; reference: examples/infer_image.rs): the host-side
BatchLoader (threaded decode + native C++ resize) keeps fixed-shape uint8
batches ahead of the device; the device runs the staged inference; masks
come back at the model resolution and are Lanczos3-resized to each image's
original size on the host (native OpenMP path).

Usage:
  python -m birefnet_tpu.serve imgs/*.jpg --out masks/ \
      --checkpoint model.safetensors --batch 4 --dtype bfloat16
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="BiRefNet batch segmentation (TPU-native)")
    parser.add_argument("inputs", nargs="+",
                        help="image files, globs, or directories")
    parser.add_argument("--out", default="masks",
                        help="output directory (default: masks/)")
    parser.add_argument("--checkpoint", required=False, default=None)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--backbone",
                        choices=("swin_v1_t", "swin_v1_s", "swin_v1_b",
                                 "swin_v1_l"),
                        default="swin_v1_l",
                        help="Swin backbone preset (non-L variants need a "
                             "matching checkpoint)")
    parser.add_argument("--dtype", choices=("float32", "bfloat16"),
                        default="bfloat16")
    parser.add_argument("--deform-mode",
                        choices=("deformable", "deformable-local", "regular",
                                 "auto"),
                        default="deformable",
                        help="auto = probe max|offset| on the first batch "
                        "with exact sampling, then serve deformable-local "
                        "at the measured radius (calibrate.py)")
    parser.add_argument("--auto-radius-cap", type=int, default=8,
                        help="auto mode: fall back to exact sampling when "
                        "the probed radius exceeds this")
    parser.add_argument("--int8-mlp", action="store_true",
                        help="selective W8A8 quantization of the wide-stage "
                        "MLP kernels (faster; stays inside the mask-MAE "
                        "accuracy gate — see PARITY.md)")
    parser.add_argument("--int8-attn", action="store_true",
                        help="same W8A8 scheme on the wide-stage attention "
                        "qkv/proj projections")
    parser.add_argument("--aot-dir", default=os.environ.get(
                        "BIREFNET_AOT_DIR"), metavar="DIR",
                        help="persist compiled unit executables here and "
                        "reload them on restart (skips trace+lower+compile "
                        "for warm starts)")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--dp", type=int, default=0, metavar="N",
                        help="shard each batch over N data-parallel mesh "
                        "groups (batch must be divisible by N; "
                        "0 = single device)")
    parser.add_argument("--spatial", type=int, default=1, metavar="M",
                        help="additionally shard activation height M-way "
                        "within each data group (HR configs; total chips "
                        "= dp*spatial)")
    args = parser.parse_args(argv)

    paths = []
    for inp in args.inputs:
        if os.path.isdir(inp):
            for ext in ("*.png", "*.jpg", "*.jpeg", "*.webp", "*.bmp"):
                paths.extend(sorted(glob.glob(os.path.join(inp, ext))))
        else:
            paths.extend(sorted(glob.glob(inp)) or [inp])
    if not paths:
        print("error: no input images found", file=sys.stderr)
        return 1

    from .cli import default_checkpoint_path
    ckpt = args.checkpoint or default_checkpoint_path()
    if ckpt is None:
        print("error: no checkpoint found; pass --checkpoint",
              file=sys.stderr)
        return 1

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import birefnet_tpu as bt
    from birefnet_tpu import staged
    from birefnet_tpu.loader import BatchLoader
    from birefnet_tpu.utils import native

    import dataclasses
    cfg = dataclasses.replace(bt.BiRefNetConfig.for_backbone(args.backbone),
                              size=(args.size, args.size))
    on_tpu = jax.default_backend() == "tpu"
    compute = bt.ComputeConfig(
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        use_flash_attention=on_tpu and "DISABLE_FLASH_ATTN" not in os.environ,
        use_pallas_deform=on_tpu,
        deform_mode=("deformable" if args.deform_mode == "auto"
                     else args.deform_mode),
        unroll_deep_stage=on_tpu,
        int8_mlp=args.int8_mlp,
        int8_attn=args.int8_attn,
    )
    mesh = None
    if args.spatial > 1 and not args.dp:
        # --spatial composes with --dp (total chips = dp*spatial); without
        # it the mesh would silently never be built and the request would
        # run unsharded on one device.
        print("error: --spatial requires --dp (use --dp 1 for a "
              "spatial-only mesh)", file=sys.stderr)
        return 1
    if args.dp:
        from birefnet_tpu.parallel.mesh import make_mesh
        if args.batch % args.dp != 0:
            print(f"error: --batch {args.batch} not divisible by "
                  f"--dp {args.dp}", file=sys.stderr)
            return 1
        n_chips = args.dp * args.spatial
        if n_chips > len(jax.devices()):
            print(f"error: --dp {args.dp} x --spatial {args.spatial} > "
                  f"{len(jax.devices())} devices", file=sys.stderr)
            return 1
        mesh = make_mesh(n_chips, spatial=args.spatial)
        print(f"Sharded over {n_chips} devices (data {args.dp} x "
              f"spatial {args.spatial}; "
              f"{args.batch // args.dp} images/group/step)")

    print(f"Loading {ckpt} ...")
    params = bt.load_checkpoint(ckpt, cfg)

    if args.deform_mode == "auto":
        # Probe max|offset| on the first batch with exact sampling, then
        # serve each deformable site at its own calibrated local radius —
        # faithful w.r.t. the probed data, at MXU-sampling speed
        # (calibrate.py; sites over the cap keep exact sampling alone).
        from birefnet_tpu import calibrate
        from birefnet_tpu.loader import load_frame
        probe = [load_frame(p, args.size)[0] for p in paths[:args.batch]]
        while len(probe) < args.batch:
            probe.append(np.zeros_like(probe[0]))
        print("Calibrating deformable offset radii on the first batch ...")
        compute, maxima, radii = calibrate.auto_deform_compute(
            params, cfg, jnp.asarray(np.stack(probe)), compute,
            cap=args.auto_radius_cap)
        print(f"  probed max|offset|: max={maxima.max():.2f}px "
              f"median={np.median(maxima):.2f}px")
        if radii is None:
            print(f"  -> exact deformable everywhere (every site probed "
                  f"> cap {args.auto_radius_cap}px)")
        else:
            n_exact = sum(r is None for r in radii)
            print(f"  -> per-site deformable-local radii {radii}"
                  + (f" ({n_exact} site(s) stay exact)" if n_exact else ""))

    # Masks come back at model resolution; host resizes per original size.
    # warmup_batch AOT-compiles all units up front so the first batch pays
    # no compile latency; --aot-dir persists the compiled executables so a
    # RESTARTED server also skips trace+lower+compile (staged.py).
    infer = staged.make_staged_infer_fn(
        params, cfg, compute, out_size=(args.size, args.size),
        warmup_batch=args.batch, mesh=mesh, aot_dir=args.aot_dir)
    if args.aot_dir and infer._aot["loaded_from_disk"]:
        print(f"AOT units loaded from disk: "
              f"{infer._aot['loaded_from_disk']}")

    os.makedirs(args.out, exist_ok=True)
    loader = BatchLoader(paths, batch_size=args.batch, size=args.size)

    # Three-way overlap: the loader preps batch N+2 on its own threads,
    # up to `depth` device batches stay in flight (dispatch is async; the
    # readback via np.asarray is the only fence on this platform), and
    # mask resize + PNG encode run on a host thread pool behind the
    # readback. The device never waits on PNG IO and vice versa.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    from PIL import Image

    def post_one(mask, oh, ow, src):
        out = native.resize_lanczos3_u8(mask[..., None], oh, ow)[..., 0]
        dst = os.path.join(
            args.out,
            os.path.splitext(os.path.basename(src))[0] + "_mask.png")
        Image.fromarray(out).save(dst)
        return dst

    pool = ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 4))
    futures = deque()
    inflight = deque()
    depth = 2
    it = iter(paths)

    def drain_one():
        dev, sizes_, paths_ = inflight.popleft()
        masks = np.asarray(dev)
        for i, (oh, ow) in enumerate(sizes_):
            futures.append(pool.submit(post_one, masks[i], oh, ow,
                                       paths_[i]))
        # Surface host post-processing failures (unwritable --out, codec
        # errors) promptly — as soon as their batch's futures have settled —
        # instead of after the whole run.
        while futures and futures[0].done():
            futures.popleft().result()

    t0 = time.time()
    done = 0
    try:
        for frames, sizes in loader:
            dev = infer(jnp.asarray(frames))
            inflight.append((dev, sizes, [next(it) for _ in sizes]))
            done += len(sizes)
            if len(inflight) > depth:
                drain_one()
        while inflight:
            drain_one()
        for f in futures:
            f.result()
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
    dt = time.time() - t0
    print(f"Segmented {done} images in {dt:.1f}s "
          f"({done / dt:.2f} img/s incl. IO)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
