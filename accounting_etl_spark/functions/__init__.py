from .detsum import dsum, dmean, DEC2, DEC4

__all__ = ["dsum", "dmean", "DEC2", "DEC4"]
