"""Large-scale float32-vs-int divergence measurement.

Runs the float32 oracle (bit-for-bit Go arithmetic: f32 magnitude LUT +
sequential f32 cumsum + signbit quantize, protocol/decode.go:209-243) and
the exact-int oracle (the TPU path's arithmetic) over many randomized noisy
captures across protocols, chip lengths and SNRs, and reports:

- capture-level divergence rate (message streams differ at all)
- bit-level near-tie census: fraction of Manchester quantized bits that
  differ between the two arithmetics (the underlying mechanism)
- q6 near-tie census: fraction of R900 6-ary symbol decisions (the strict->
  argmax chain of r900/r900.go:133-143 over three f32 kernel sums) that
  differ — R900's own tie surface, separate from the Manchester one

Usage: JAX not needed (pure NumPy). ``python tools/divergence.py [n]``
writes a summary to stdout; run with n>=300 for the committed figure.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.protocols.base import build_decoder_config
from rtlamr_tpu.ref import ReferenceDecoder, synth
from rtlamr_tpu.ref.decoder import mag_lut_f32, mag_int

from test_fuzz_conformance import PROTOS, random_capture


def bit_divergence(iq: np.ndarray, chip_length: int) -> tuple[int, int]:
    """Count quantized bits differing between f32 and int arithmetic with the
    reference's PER-BLOCK buffer semantics (decode.go:163-245): the f32
    cumsum restarts every block over the BlockSize+SymbolLength signal
    buffer, so rounding error never accumulates past one block. A
    whole-stream f32 cumsum would wildly overstate near-ties."""
    parsers = [new_parser("scm", chip_length)]
    dec_f = ReferenceDecoder(parsers, arithmetic="float32")
    dec_i = ReferenceDecoder(
        [new_parser("scm", chip_length)], arithmetic="int"
    )
    cfg = dec_f.cfg
    bs, bs2 = cfg.block_size, cfg.block_size2
    v = np.asarray(iq, np.uint8)
    diff = 0
    total = 0
    for b in range(v.size // bs2):
        block = v[b * bs2 : (b + 1) * bs2]
        for d in (dec_f, dec_i):
            d.signal[: cfg.symbol_length] = d.signal[bs:]
            d.signal[cfg.symbol_length :] = d._demodulate(block)
        bits_f = dec_f._filter_quantize()
        bits_i = dec_i._filter_quantize()
        diff += int((bits_f != bits_i).sum())
        total += bits_f.size
    return diff, total


def q6_divergence(iq: np.ndarray, chip_length: int) -> tuple[int, int]:
    """Count R900 6-ary symbol decisions differing between f32 and int
    arithmetic.

    The R900 quantizer (r900/r900.go:133-143) picks argmax over |a0|,|a1|,
    |a2| with strict ``>`` updates (first-max tie semantics) plus the sign of
    the winner — a 6-way decision whose near-tie surface is distinct from
    the Manchester signbit's: two kernel magnitudes can straddle under f32
    rounding while every Manchester bit agrees. Same per-block buffer
    semantics as :func:`bit_divergence`; each stream position is counted
    once via the freshly-appended tail of the valid filter region.
    """
    dec_f = ReferenceDecoder([new_parser("r900", chip_length)], "float32")
    dec_i = ReferenceDecoder([new_parser("r900", chip_length)], "int")
    cfg = dec_f.cfg
    bs, bs2 = cfg.block_size, cfg.block_size2
    limit = cfg.buffer_length - 4 * cfg.chip_length
    v = np.asarray(iq, np.uint8)
    diff = 0
    total = 0
    for b in range(v.size // bs2):
        block = v[b * bs2 : (b + 1) * bs2]
        for d in (dec_f, dec_i):
            d.signal[: cfg.symbol_length] = d.signal[bs:]
            d.signal[cfg.symbol_length :] = d._demodulate(block)
            d.r900_signal[: cfg.packet_length] = d.r900_signal[bs:]
            d.r900_signal[cfg.packet_length :] = d.signal[cfg.symbol_length :]
            d._r900_filter()
        qf = dec_f.r900_quantized[limit - bs : limit]
        qi = dec_i.r900_quantized[limit - bs : limit]
        diff += int((qf != qi).sum())
        total += qf.size
    return diff, total


def main() -> None:
    n_captures = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    rng_master = np.random.default_rng(42)
    capture_div = 0
    examples = []
    bit_diff = 0
    bit_total = 0
    q6_diff = 0
    q6_total = 0
    for i in range(n_captures):
        rng = np.random.default_rng(int(rng_master.integers(1 << 60)))
        chip_length = int(rng.choice([8, 32, 72]))
        k = int(rng.integers(1, len(PROTOS) + 1))
        names = list(rng.choice(PROTOS, size=k, replace=False))
        iq = random_capture(rng, names, chip_length)

        f32 = [
            (b, str(m))
            for b, m in ReferenceDecoder(
                [new_parser(n, chip_length) for n in names], "float32"
            ).decode_capture(iq)
        ]
        i64 = [
            (b, str(m))
            for b, m in ReferenceDecoder(
                [new_parser(n, chip_length) for n in names], "int"
            ).decode_capture(iq)
        ]
        if f32 != i64:
            capture_div += 1
            examples.append({"seed_index": i, "chip": chip_length, "protos": names})
        d, t = bit_divergence(iq, chip_length)
        bit_diff += d
        bit_total += t
        d, t = q6_divergence(iq, chip_length)
        q6_diff += d
        q6_total += t
        if (i + 1) % 50 == 0:
            print(
                f"{i+1}/{n_captures}: {capture_div} diverged, "
                f"bit near-ties {bit_diff}/{bit_total}, "
                f"q6 near-ties {q6_diff}/{q6_total}",
                file=sys.stderr,
            )
    print(
        json.dumps(
            {
                "captures": n_captures,
                "capture_divergence": capture_div,
                "capture_divergence_rate": capture_div / n_captures,
                "bit_near_ties": bit_diff,
                "bits_compared": bit_total,
                "bit_divergence_rate": bit_diff / max(bit_total, 1),
                "q6_near_ties": q6_diff,
                "q6_symbols_compared": q6_total,
                "q6_divergence_rate": q6_diff / max(q6_total, 1),
                "examples": examples[:10],
            }
        )
    )


if __name__ == "__main__":
    main()
