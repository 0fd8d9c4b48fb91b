"""Worker process for multi-host decode tests/demos.

Usage (one invocation per simulated host):
  python tools/multihost_worker.py <coordinator> <num_procs> <proc_id> \
      <out_json> [devices_per_proc=2] [scan_windows=2]

Each process regenerates the same deterministic global capture (stand-in
for its shard of a distributed ingest), feeds only its OWN contiguous
segment to MultiHostDecoder, and writes its decoded (block, type, id,
message-string) records to <out_json>. The parent test asserts the union
over processes equals the single-process oracle exactly once each.
"""

from __future__ import annotations

import json
import sys


def build_capture(cfg, w, n_windows, chip):
    """Deterministic global capture: packets inside process 0's run, exactly
    on the process seam, and inside process 1's run, in noise."""
    from rtlamr_tpu.ref import synth

    sl = cfg.symbol_length
    scm_len = 96 * sl
    seam = (n_windows // 2) * w  # boundary between the two processes
    bursts = [
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111111, consumption=1),
            cfg.block_size // 2,
        ),
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=222222, consumption=2),
            seam - scm_len // 2,  # straddles the host boundary (DCN halo)
        ),
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=333333, consumption=3),
            seam + 2 * cfg.block_size,
        ),
    ]
    return synth.render_iq(n_windows * w, bursts, chip, noise=2.0, seed=77)


def main() -> None:
    coordinator, num_procs, proc_id, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    devices_per_proc = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    scan_windows = int(sys.argv[6]) if len(sys.argv) > 6 else 2

    from rtlamr_tpu.parallel.distributed import MultiHostDecoder, initialize

    initialize(
        coordinator, num_procs, proc_id,
        cpu_devices_per_process=devices_per_proc,
    )

    from rtlamr_tpu.protocols import new_parser

    chip = 8
    parsers = [new_parser("scm", chip)]
    dec = MultiHostDecoder(
        parsers, window_blocks=None, scan_windows=scan_windows
    )
    w = dec.spec.window
    n_windows = dec.n_global * scan_windows
    iq = build_capture(dec.cfg, w, n_windows, chip)

    lo = proc_id * dec.local_window_bytes
    hi = lo + dec.local_window_bytes
    msgs = dec.decode_superbatch_local(iq[lo:hi])

    records = [
        {
            "block": b,
            "type": m.msg_type(),
            "id": m.meter_id(),
            "text": str(m),
        }
        for b, m in msgs
    ]
    with open(out_path, "w") as f:
        json.dump({"process": proc_id, "messages": records}, f)
    print(f"process {proc_id}: {len(records)} messages", file=sys.stderr)


if __name__ == "__main__":
    main()
