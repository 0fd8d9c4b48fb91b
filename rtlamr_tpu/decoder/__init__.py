from .dedup import BlockDeduper

__all__ = ["BlockDeduper"]
