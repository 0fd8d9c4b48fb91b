from .dedup import BlockDeduper
from .pipeline import WindowDecoder

__all__ = ["BlockDeduper", "WindowDecoder"]
