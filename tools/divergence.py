"""Large-scale float32-vs-int divergence measurement.

Runs the float32 oracle (bit-for-bit Go arithmetic: f32 magnitude LUT +
sequential f32 cumsum + signbit quantize, protocol/decode.go:209-243) and
the exact-int oracle (the TPU path's arithmetic) over many randomized noisy
captures across protocols, chip lengths and SNRs, and reports:

- capture-level divergence rate (message streams differ at all)
- bit-level near-tie census: fraction of quantized bits that differ
  between the two arithmetics (the underlying mechanism)

Usage: JAX not needed (pure NumPy). ``python tools/divergence.py [n]``
writes a summary to stdout; run with n>=300 for the committed figure.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

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


def main() -> None:
    n_captures = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    rng_master = np.random.default_rng(42)
    capture_div = 0
    examples = []
    bit_diff = 0
    bit_total = 0
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
        if (i + 1) % 50 == 0:
            print(
                f"{i+1}/{n_captures}: {capture_div} diverged, "
                f"bit near-ties {bit_diff}/{bit_total}",
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
                "examples": examples[:10],
            }
        )
    )


if __name__ == "__main__":
    main()
