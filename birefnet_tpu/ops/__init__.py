from . import attention, deform_conv, layers, resize, window

__all__ = ["attention", "deform_conv", "layers", "resize", "window"]
