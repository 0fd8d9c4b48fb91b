"""Host-parse capacity bench at storm density (VERDICT r3 item 4).

The TPU engine parses candidates on host (decoder/pipeline._parse_window);
at high meter density the HOST — not the chip — caps throughput. This
bench measures that cap directly: it builds synthetic window RESULT
matrices (hundreds of distinct valid packets per window, every registered
protocol, spread over the window's blocks — bypassing the device entirely)
and times repeated ``_parse_window`` calls on a streaming decoder.

Reported numbers:
- ``messages_per_s``: decoded Message dataclasses emitted per second.
- ``equivalent_samples_per_s``: window samples / parse seconds — the
  sample rate at which host parse alone would saturate one core at this
  density (compare against bench.py's per-chip device rate).

Usage: python tools/parse_bench.py [iters=50] [per_group=200]
Writes PARSE_BENCH.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def build_storm(dec, per_group: int):
    """Synthetic unpack_results-shaped dict: ``per_group`` distinct valid
    packets per preamble group, ascending idx spread over the blocks."""
    from rtlamr_tpu.ref import synth
    from rtlamr_tpu.utils.bits import pack_bits

    spec = dec.spec
    res_idx, res_bytes, res_syms, counts = [], [], {}, []
    for g, gspec in enumerate(spec.groups):
        n = per_group
        idx = np.linspace(
            0, spec.window - 1, n, dtype=np.int64
        ).astype(np.int32)
        nbytes = (gspec.packet_symbols + 7) >> 3
        names = {p.cfg.protocol for p in dec._group_parsers[g]}
        if gspec.wants_r900:
            syms = np.stack(
                [
                    synth.make_r900_symbols(meter_id=1_000_000 + g * 10_000 + i)
                    for i in range(n)
                ]
            ).astype(np.uint8)
            res_syms[g] = syms
            data = np.zeros((n, nbytes), np.uint8)
        else:
            if "scm" in names:
                mk = lambda i: synth.make_scm_bits(
                    meter_id=2_000_000 + i, consumption=i
                )
            elif "scm+" in names:
                mk = lambda i: synth.make_scmplus_bits(
                    endpoint_id=3_000_000 + i, consumption=i
                )
            else:  # idm/netidm group
                mk = lambda i: synth.make_idm_bits(serial=4_000_000 + i)
            rows = []
            for i in range(n):
                bits = np.zeros(nbytes * 8, np.uint8)
                raw = mk(i)
                bits[: raw.size] = raw
                rows.append(pack_bits(bits))
            data = np.stack(rows)
        res_idx.append(idx)
        res_bytes.append(data)
        counts.append([n, n])
    # Per-parser validity bitmasks as the DEVICE path would supply them
    # (ops/frontend pvalid): computed once here, outside the timed loop —
    # the production host parse never recomputes a CRC.
    res_pvalid = []
    for g, gspec in enumerate(spec.groups):
        data = res_bytes[g]
        syms = res_syms.get(g)
        pv = np.zeros(data.shape[0], np.uint8)
        for j, p in enumerate(dec._group_parsers[g]):
            pv |= (p.valid_mask(data, syms).astype(np.uint8)) << j
        res_pvalid.append(pv)
    return {
        "counts": np.asarray(counts, np.int32),
        "idx": res_idx,
        "pvalid": res_pvalid,
        "bytes": res_bytes,
        "symbols": res_syms,
    }


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    per_group = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.protocols import new_parser

    names = ("scm", "scm+", "idm", "netidm", "r900", "r900bcd")
    dec = WindowDecoder(
        [new_parser(n, 72) for n in names],
        window_blocks=64,
        max_hits=4 * per_group,
    )
    res = build_storm(dec, per_group)

    # Warmup (also sanity-checks the storm actually parses).
    warm = dec._parse_window(res, None, dec._window_index)
    dec._window_index += 1
    assert len(warm) >= 4 * per_group, (
        f"storm under-parses: {len(warm)} msgs"
    )

    t0 = time.perf_counter()
    total = 0
    for _ in range(iters):
        total += len(dec._parse_window(res, None, dec._window_index))
        dec._window_index += 1
    elapsed = time.perf_counter() - t0

    msgs_per_s = total / elapsed
    win_s = elapsed / iters
    eq_rate = dec.spec.window / win_s
    result = {
        "metric": "host_parse_messages_per_s",
        "value": round(msgs_per_s, 1),
        "unit": "messages/s",
        "messages_per_window": total // iters,
        "parse_ms_per_window": round(win_s * 1e3, 3),
        "equivalent_samples_per_s": round(eq_rate, 1),
        "window_samples": dec.spec.window,
        "per_group": per_group,
        "iters": iters,
        "protocols": list(names),
        # The round-4 scalar baseline this bench was built against (same
        # config, before the vectorized parse_batch path landed): the
        # per-candidate Python loop peaked at ~9.1k msgs/s = 131.7 ms per
        # window = an equivalent host cap of ~4.0 MS/s.
        "before_vectorization": {
            "messages_per_s": 9109.3,
            "parse_ms_per_window": 131.734,
            "equivalent_samples_per_s": 3979900.0,
        },
    }
    with open(os.path.join(_REPO, "PARSE_BENCH.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
