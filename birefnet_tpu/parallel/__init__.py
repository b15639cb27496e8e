from . import mesh, sharding

__all__ = ["mesh", "sharding"]
