"""Plugin tier: third-party effect UGens (reference: knaster_airwindows)."""

from .galactic import Galactic

__all__ = ["Galactic"]
