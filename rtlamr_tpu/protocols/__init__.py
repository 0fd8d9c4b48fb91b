"""Protocol registry. Importing this package registers all six parsers,
mirroring the reference's blank imports (main.go:39-44)."""

from .base import (
    Candidate,
    DecoderConfig,
    Digest,
    Message,
    PacketConfig,
    Parser,
    build_decoder_config,
    digest,
    new_parser,
    next_power_of_2,
    register_parser,
    registered_protocols,
)

# Self-registration, like Go's init() + underscore imports.
from . import scm  # noqa: F401
from . import scmplus  # noqa: F401
from . import idm  # noqa: F401
from . import netidm  # noqa: F401
from . import r900  # noqa: F401
from . import r900bcd  # noqa: F401

__all__ = [
    "Candidate",
    "DecoderConfig",
    "Digest",
    "Message",
    "PacketConfig",
    "Parser",
    "build_decoder_config",
    "digest",
    "new_parser",
    "next_power_of_2",
    "register_parser",
    "registered_protocols",
]
