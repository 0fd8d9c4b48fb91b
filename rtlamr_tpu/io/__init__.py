from .capture import (
    ArraySource,
    FileSource,
    IQSource,
    RtlTcpSource,
    SampleDumper,
    StdinSource,
)
from .rtltcp import DongleInfo, RtlTcpClient

__all__ = [
    "ArraySource",
    "DongleInfo",
    "FileSource",
    "IQSource",
    "RtlTcpClient",
    "RtlTcpSource",
    "SampleDumper",
    "StdinSource",
]
