"""Checkpoint EXPORT tests: the torch-schema writer inverts the loader.

Two-way contract: build_param_tree (load) and export_checkpoint (save)
round-trip bit-exactly, so parameters trained here (train.py) are
consumable by upstream torch BiRefNet and by the reference
implementation, which load the same ZhengPeng7 schema.
"""

import jax
import numpy as np

import birefnet_tpu as bt
from birefnet_tpu.params import (
    build_param_tree,
    checkpoint_spec,
    export_checkpoint,
    random_checkpoint,
    save_checkpoint,
)


def _flat(tree):
    return jax.tree_util.tree_flatten_with_path(tree)[0]


def test_export_roundtrip_bit_exact():
    cfg = bt.BiRefNetConfig.swin_l()
    flat = random_checkpoint(cfg, seed=3)
    tree = build_param_tree(flat, cfg)

    exported = export_checkpoint(tree, cfg)
    # Schema equality is validated inside export_checkpoint; re-assert the
    # tensor count against the spec here.
    assert len(exported) == len(checkpoint_spec(cfg))

    # Non-BN tensors reproduce the ORIGINAL bits (transposes/scatters are
    # exact inverses). BN stats are folded at load, so the exported BN is a
    # different-but-equivalent (gamma=scale, var=1-eps) parameterization —
    # checked below via the tree-level round trip instead.
    for name in ("bb.patch_embed.proj.weight",
                 "bb.layers.0.blocks.0.attn.qkv.weight",
                 "bb.layers.0.blocks.0.attn.relative_position_bias_table",
                 "squeeze_module.0.dec_att.aspp1.atrous_conv.offset_conv.weight",
                 "decoder.conv_out1.0.weight",
                 "decoder.ipt_blk1.conv1.bias"):
        np.testing.assert_array_equal(exported[name], flat[name], err_msg=name)

    # Full-tree bit-exact round trip (load ∘ export == identity on trees).
    tree2 = build_param_tree(exported, cfg)
    for (ka, a), (kb, b) in zip(_flat(tree), _flat(tree2)):
        assert ka == kb
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(ka))


def test_save_checkpoint_file_loads_back(tmp_path):
    cfg = bt.BiRefNetConfig.swin_l()
    # device_put: the file path must round-trip a JAX-backed tree too —
    # a non-contiguity bug in the writer corrupted exactly this case
    # (numpy trees round-tripped fine) before export_checkpoint forced
    # C-contiguous outputs.
    tree = jax.device_put(
        build_param_tree(random_checkpoint(cfg, seed=5), cfg))
    path = str(tmp_path / "exported.safetensors")
    save_checkpoint(path, tree, cfg)

    loaded = bt.load_checkpoint(path, cfg)
    for (ka, a), (kb, b) in zip(_flat(tree), _flat(loaded)):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
