from . import blocked, core, leaf

__all__ = ["blocked", "core", "leaf"]
