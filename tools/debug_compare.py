#!/usr/bin/env python
"""Cross-framework intermediate comparison (the reference's debug_compare.py
/ debug_swin_stages.py analog, reference repo root).

Runs the JAX framework and the self-contained PyTorch oracle side by side on
the same (random or real) checkpoint and input, printing per-intermediate
sums/ranges for eyeball diffing, and optionally dumping .npy goldens.

Usage:
  python tools/debug_compare.py [--checkpoint model.safetensors]
      [--size 64] [--dump-dir goldens/]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def stats(name: str, arr: np.ndarray) -> None:
    arr = np.asarray(arr, np.float32)
    print(f"{name:28s} shape={str(tuple(arr.shape)):24s} "
          f"sum={arr.sum():14.4f} min={arr.min():9.4f} "
          f"max={arr.max():9.4f} mean={arr.mean():9.5f}")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--dump-dir", default=None)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch
    import birefnet_tpu as bt
    from birefnet_tpu.models import swin as bswin, birefnet as bmodel
    from torch_ref import birefnet_torch as tref

    cfg = bt.BiRefNetConfig.swin_l()
    if args.checkpoint:
        from safetensors import safe_open
        tensors = {}
        with safe_open(args.checkpoint, framework="np") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    else:
        print(f"(no checkpoint given; using random_checkpoint seed "
              f"{args.seed})")
        tensors = bt.random_checkpoint(cfg, seed=args.seed)

    params = jax.tree.map(jnp.asarray, bt.build_param_tree(tensors, cfg))
    tm = tref.BiRefNetTorch()
    tref.load_flat_checkpoint(tm, tensors)

    rng = np.random.default_rng(0)
    s = args.size
    x = (rng.normal(size=(1, s, s, 3)) * 0.5).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)

    dumps = {}
    print("=== backbone stages (full scale) ===")
    feats = bswin.swin_forward(params["bb"], cfg.swin_config(), jnp.asarray(x))
    with torch.no_grad():
        tfeats = tm.bb(tx)
    for i, (f, tf) in enumerate(zip(feats, tfeats)):
        f_np = np.asarray(f)
        t_np = tf.permute(0, 2, 3, 1).numpy()
        stats(f"jax  x{i + 1}", f_np)
        stats(f"ref  x{i + 1}", t_np)
        print(f"    max|diff| = {np.abs(f_np - t_np).max():.3e}")
        dumps[f"stage{i + 1}_jax"] = f_np
        dumps[f"stage{i + 1}_ref"] = t_np

    print("=== end-to-end logits ===")
    logits = np.asarray(bmodel.forward_logits(params, cfg, jnp.asarray(x)))
    with torch.no_grad():
        tlogits = tm.forward_logits(tx).permute(0, 2, 3, 1).numpy()
    stats("jax  logits", logits)
    stats("ref  logits", tlogits)
    print(f"    max|diff| = {np.abs(logits - tlogits).max():.3e}")
    mask = 1 / (1 + np.exp(-logits))
    tmask = 1 / (1 + np.exp(-tlogits))
    print(f"    mask MAE  = {np.abs(mask - tmask).mean():.3e} "
          f"(target < 1e-3)")
    dumps["logits_jax"] = logits
    dumps["logits_ref"] = tlogits

    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)
        for k, v in dumps.items():
            np.save(os.path.join(args.dump_dir, f"{k}.npy"), v)
        print(f"dumped {len(dumps)} goldens to {args.dump_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
