from . import aspp, birefnet, decoder, swin

__all__ = ["aspp", "birefnet", "decoder", "swin"]
