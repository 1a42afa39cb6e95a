from .pipeline import Warehouse

__all__ = ["Warehouse"]
