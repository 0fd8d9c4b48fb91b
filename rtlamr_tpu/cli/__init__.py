from .encoders import LogMessage, make_encoder
from .filters import FilterChain, MeterIDFilter, MeterTypeFilter, UniqueFilter
from .flags import FlagSet, build_flagset, parse_duration
from .main import main

__all__ = [
    "FilterChain",
    "FlagSet",
    "LogMessage",
    "MeterIDFilter",
    "MeterTypeFilter",
    "UniqueFilter",
    "build_flagset",
    "main",
    "make_encoder",
    "parse_duration",
]
