from . import analytics, cleaning, ohlc, quality

__all__ = ["analytics", "cleaning", "ohlc", "quality"]
