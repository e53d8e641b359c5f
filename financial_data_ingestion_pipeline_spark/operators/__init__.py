from . import analytics, asof, cleaning, ohlc, quality, warehouse

__all__ = ["analytics", "asof", "cleaning", "ohlc", "quality", "warehouse"]
