"""Recall-vs-reference scoring harness (SURVEY.md §7.7).

Generates a long synthetic capture with known planted packets across an SNR
sweep, decodes it with the oracle (the Go-semantics ground truth) and with
the TPU window pipeline, and scores:

- recall: fraction of planted packets recovered by each decoder
- agreement: whether the two decoders' message streams match exactly

Usage: python tools/conformance.py [chip_length] [n_packets]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from rtlamr_tpu.decoder import WindowDecoder
from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.protocols.base import build_decoder_config
from rtlamr_tpu.ref import ReferenceDecoder, synth


def main() -> None:
    chip_length = int(sys.argv[1]) if len(sys.argv) > 1 else 72
    n_packets = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    names = ["scm", "scm+", "idm", "r900"]

    cfg = build_decoder_config([new_parser(n, chip_length) for n in names])
    rng = np.random.default_rng(7)
    gap = cfg.packet_length + 4 * cfg.block_size
    planted = []
    bursts = []
    offset = cfg.block_size
    for i in range(n_packets):
        kind = names[i % len(names)]
        mid = 1_000_000 + i
        if kind == "scm":
            bursts.append(
                synth.bits_to_burst(synth.make_scm_bits(meter_id=mid), offset)
            )
        elif kind == "scm+":
            bursts.append(
                synth.bits_to_burst(
                    synth.make_scmplus_bits(endpoint_id=mid), offset
                )
            )
        elif kind == "idm":
            bursts.append(
                synth.bits_to_burst(synth.make_idm_bits(serial=mid), offset)
            )
        else:
            bursts.append(
                synth.r900_burst(synth.make_r900_symbols(meter_id=mid), offset)
            )
        planted.append((kind, mid))
        offset += gap
    total = ((offset + cfg.packet_length) // cfg.block_size + 2) * cfg.block_size
    # moderate noise: decodable but nontrivial
    iq = synth.render_iq(total, bursts, chip_length, hi=180, noise=10.0, seed=3)

    oracle = ReferenceDecoder(
        [new_parser(n, chip_length) for n in names], arithmetic="int"
    )
    want = [(b, str(m), m.meter_id()) for b, m in oracle.decode_capture(iq)]

    dec = WindowDecoder(
        [new_parser(n, chip_length) for n in names], window_blocks=32
    )
    got = [(b, str(m), m.meter_id()) for b, m in dec.decode_capture(iq)]

    planted_ids = {mid for _, mid in planted}
    recall_oracle = len({mid for _, _, mid in want} & planted_ids) / len(planted_ids)
    recall_tpu = len({mid for _, _, mid in got} & planted_ids) / len(planted_ids)
    agree = [x[:2] for x in got] == [x[:2] for x in want]

    print(
        json.dumps(
            {
                "planted": len(planted_ids),
                "oracle_msgs": len(want),
                "tpu_msgs": len(got),
                "recall_oracle": round(recall_oracle, 4),
                "recall_tpu": round(recall_tpu, 4),
                "bit_exact_agreement": agree,
            }
        )
    )
    if not agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
