"""birefnet_tpu — a TPU-native (JAX/XLA/Pallas) BiRefNet inference framework.

A from-scratch re-design of the capabilities of the reference
`imperatormk/candle-birefnet` (Rust + candle + Metal) for TPU hardware:
NHWC functional models, trace-time-constant window machinery, fused Pallas
kernels for the hot ops, and mesh-sharded execution for scale-out.

Public surface mirrors the reference crate root (reference: src/lib.rs:6-14).
"""

from .configs import (
    BiRefNetConfig,
    ComputeConfig,
    DecoderConfig,
    SwinConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from .params import (
    build_param_tree,
    checkpoint_spec,
    init_params,
    load_checkpoint,
    random_checkpoint,
)
from .models import birefnet, decoder, swin, aspp

__all__ = [
    "BiRefNetConfig",
    "ComputeConfig",
    "DecoderConfig",
    "SwinConfig",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "build_param_tree",
    "checkpoint_spec",
    "init_params",
    "load_checkpoint",
    "random_checkpoint",
    "birefnet",
    "decoder",
    "swin",
    "aspp",
]

__version__ = "0.1.0"
