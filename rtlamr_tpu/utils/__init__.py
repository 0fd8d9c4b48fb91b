from .crc import CRC, crc_table, crc16, crc16_batch
from .gf import GF, rs_syndromes_batch
from .bits import pack_bits, unpack_bits, bits_to_uint

__all__ = [
    "CRC",
    "crc_table",
    "crc16",
    "crc16_batch",
    "GF",
    "rs_syndromes_batch",
    "pack_bits",
    "unpack_bits",
    "bits_to_uint",
]
