"""Worker process for multi-host decode tests/demos.

Usage (one invocation per simulated host):
  python tools/multihost_worker.py <coordinator> <num_procs> <proc_id> \
      <out_json> [devices_per_proc=2] [scan_windows=2] [scenario=basic]

Each process regenerates the same deterministic global capture (stand-in
for its shard of a distributed ingest), feeds only its OWN contiguous
segment to MultiHostDecoder, and writes its decoded (block, type, id,
message-string) records to <out_json>. The parent test asserts the union
over processes equals the single-process oracle exactly once each.

Scenarios:
  basic    — one super-batch; packets inside each process's run plus one
             straddling the process seam (DCN halo exactly-once recovery).
             Works at any process count (the seam is placed on the middle
             process boundary) — the test suite runs it at 2 AND 4
             processes.
  hard     — two super-batches with max_hits=1: a capacity-overflow storm
             in the window AT the process seam (the escalation re-decode
             must see the true cross-process halo,
             parallel/distributed.py _local_staged_window), and a preamble
             plateau straddling the super-batch boundary (process 0's
             first block of batch 1 must dedup against the last process's
             last block of batch 0 — the cross-super-batch seam carry).
  overflow — drives the SEAM_DIGEST_CAP second allgather round: r900 AND
             r900bcd are registered (one burst => two digests per block),
             and the cap is lowered to 1, so the boundary-block digest
             exchange overflows and every process agrees to the exact-size
             re-exchange (parallel/distributed.py _seam_dedup). The cap is
             a capacity knob, not a semantic one — 2 digests over cap 1
             exercises the identical code path as 65 over the default 64.
             A plateau packet straddling the process seam additionally
             requires the re-exchanged digests to dedup correctly.
  allproto — all six protocols (scm, scm+, idm, netidm, r900, r900bcd)
             decoded in one multi-host run, packets spread across both
             processes' runs plus one on the seam.
  resume   — the 'hard' capture decoded with a checkpoint/restore between
             the two super-batches: after batch 0 every process drains,
             saves its per-process MultiHostCheckpoint, builds a FRESH
             MultiHostDecoder, restores, and decodes batch 1. The message
             stream must be identical to an uninterrupted run — including
             the 555555 plateau straddling the checkpoint boundary, whose
             dedup depends on the restored cross-super-batch seam tail and
             carry rows (decoder/checkpoint.py MultiHostCheckpoint).
"""

from __future__ import annotations

import json
import sys


def build_capture(cfg, w, n_windows, chip):
    """Deterministic global capture: packets inside the first process's
    run, exactly on the middle process seam, and inside the last process's
    run, in noise."""
    from rtlamr_tpu.ref import synth

    sl = cfg.symbol_length
    scm_len = 96 * sl
    seam = (n_windows // 2) * w  # middle process boundary
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
            # Inside the LAST process's run at 2 or 4 processes, and far
            # enough from the capture end to stay in the search horizon.
            (n_windows * 3 // 4) * w + 2 * cfg.block_size,
        ),
    ]
    return synth.render_iq(n_windows * w, bursts, chip, noise=2.0, seed=77)


def build_capture_overflow(cfg, w, n_windows, chip, halo):
    """Capture for the 'overflow' scenario: r900 bursts (each decoding as
    BOTH R900 and R900BCD => 2 digests per boundary block, over the
    lowered SEAM_DIGEST_CAP=1), one with its preamble plateau straddling
    the process seam so the re-exchanged digests must dedup it."""
    from rtlamr_tpu.ref import synth

    seam = (n_windows // 2) * w
    bursts = [
        synth.r900_burst(
            synth.make_r900_symbols(meter_id=111111), cfg.block_size // 2
        ),
        # First search position of the right process's first window: the
        # preamble plateau spans the seam, so both processes decode it in
        # adjacent blocks and the seam digest dedup must drop one copy —
        # while both boundary blocks hold 2 digests (R900 + R900BCD) > cap.
        synth.r900_burst(
            synth.make_r900_symbols(meter_id=222222), seam - halo
        ),
        synth.r900_burst(
            synth.make_r900_symbols(meter_id=333333),
            seam + 3 * cfg.block_size,
        ),
    ]
    return synth.render_iq(n_windows * w, bursts, chip, noise=2.0, seed=79)


def build_capture_allproto(cfg, w, n_windows, chip):
    """All-six-protocol capture: one packet of each type spread over both
    processes' runs, plus an SCM straddling the process seam. Offsets keep
    bursts disjoint (IDM/NetIDM are 736 symbols long)."""
    from rtlamr_tpu.ref import synth

    sl = cfg.symbol_length
    scm_len = 96 * sl
    scmplus_len = 128 * sl  # 16-byte packet (scmplus.go:46-60)
    long_len = 736 * sl  # idm/netidm burst length
    seam = (n_windows // 2) * w
    o0 = cfg.block_size // 2
    o_scmplus = o0 + scm_len + 4 * sl
    o_idm = o_scmplus + scmplus_len + 4 * sl
    bursts = [
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111111, consumption=1), o0
        ),
        synth.bits_to_burst(
            synth.make_scmplus_bits(endpoint_id=210002, consumption=2),
            o_scmplus,
        ),
        synth.bits_to_burst(synth.make_idm_bits(serial=310003), o_idm),
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=410004, consumption=4),
            seam - scm_len // 2,  # process seam
        ),
        synth.bits_to_burst(
            synth.make_netidm_bits(serial=510005),
            seam + 2 * cfg.block_size,
        ),
        synth.r900_burst(
            synth.make_r900_symbols(meter_id=610006),
            seam + 2 * cfg.block_size + long_len + 4 * sl,
        ),
    ]
    return synth.render_iq(n_windows * w, bursts, chip, noise=2.0, seed=80)


def build_capture_hard(cfg, w, batch_windows, n_batches, chip, halo):
    """Two-super-batch capture for the 'hard' scenario (see module doc).

    Batch 0: one packet in process 0's run; a packet straddling the process
    seam PLUS a second distinct packet in the same window (with max_hits=1
    that window overflows -> escalation re-decode at the seam); a packet
    whose preamble plateau straddles the super-batch boundary. Batch 1: one
    packet inside the last process's run.
    """
    from rtlamr_tpu.ref import synth

    sl = cfg.symbol_length
    scm_len = 96 * sl
    seam = (batch_windows // 2) * w  # process seam (samples)
    batch_end = batch_windows * w  # super-batch boundary (samples)
    bursts = [
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111111, consumption=1),
            cfg.block_size // 2,
        ),
        # Straddles the process seam (all but 4 samples live in the LEFT
        # process's stream); decoded from the ppermute halo.
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=222222, consumption=2),
            seam - scm_len + 4,
        ),
        # Second distinct candidate in the SAME window (disjoint samples:
        # packets may extend past the window's search span) => overflow
        # storm at the seam window when max_hits=1.
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=444444, consumption=4), seam + 8
        ),
        # Preamble plateau straddling the super-batch boundary: the hit
        # position batch_end - halo is the first search position of batch
        # 1's first window; the plateau's left half lands in the last
        # process's last block of batch 0.
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=555555, consumption=5),
            batch_end - halo,
        ),
        # Interior packet in batch 1.
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=666666, consumption=6),
            batch_end + seam + 2 * cfg.block_size,
        ),
    ]
    return synth.render_iq(
        n_batches * batch_windows * w, bursts, chip, noise=2.0, seed=78
    )


def main() -> None:
    coordinator, num_procs, proc_id, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    devices_per_proc = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    scan_windows = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    scenario = sys.argv[7] if len(sys.argv) > 7 else "basic"

    from rtlamr_tpu.parallel.distributed import MultiHostDecoder, initialize

    initialize(
        coordinator, num_procs, proc_id,
        cpu_devices_per_process=devices_per_proc,
    )

    from rtlamr_tpu.protocols import new_parser

    chip = 8
    names = {
        "overflow": ("r900", "r900bcd"),
        "allproto": ("scm", "scm+", "idm", "netidm", "r900", "r900bcd"),
    }.get(scenario, ("scm",))
    parsers = [new_parser(n, chip) for n in names]
    max_hits = 1 if scenario in ("hard", "resume") else 256
    n_batches = 2 if scenario in ("hard", "resume") else 1
    if scenario == "overflow":
        # Lower the digest-exchange capacity so 2 digests/boundary block
        # (R900 + R900BCD from one burst) overflow it — drives the loud
        # second allgather round without planting 65 physical packets.
        MultiHostDecoder.SEAM_DIGEST_CAP = 1
    dec = MultiHostDecoder(
        parsers, window_blocks=None, scan_windows=scan_windows,
        max_hits=max_hits,
    )
    w = dec.spec.window
    batch_windows = dec.n_global * scan_windows
    if scenario in ("hard", "resume"):
        iq = build_capture_hard(
            dec.cfg, w, batch_windows, n_batches, chip, dec.spec.halo
        )
    elif scenario == "overflow":
        iq = build_capture_overflow(
            dec.cfg, w, batch_windows, chip, dec.spec.halo
        )
    elif scenario == "allproto":
        iq = build_capture_allproto(dec.cfg, w, batch_windows, chip)
    else:
        iq = build_capture(dec.cfg, w, batch_windows, chip)

    msgs = []
    prior_metrics = {}
    for j in range(n_batches):
        base = j * num_procs * dec.local_window_bytes
        lo = base + proc_id * dec.local_window_bytes
        hi = lo + dec.local_window_bytes
        msgs.extend(dec.decode_superbatch_local(iq[lo:hi]))
        if scenario == "resume" and j == 0:
            # Simulated interrupt at the super-batch boundary: drain,
            # checkpoint, rebuild the decoder from scratch, restore.
            from rtlamr_tpu.decoder.checkpoint import (
                MultiHostCheckpoint,
                capture_checkpoint,
                restore_checkpoint,
            )

            msgs.extend(dec.drain())
            ckpt_path = out_path + ".ckpt"
            batch_bytes = num_procs * dec.local_window_bytes
            capture_checkpoint(dec, batch_bytes).save(ckpt_path)
            prior_metrics = dec._local.metrics.snapshot()
            dec = MultiHostDecoder(
                parsers, window_blocks=None, scan_windows=scan_windows,
                max_hits=max_hits,
            )
            restore_checkpoint(
                dec, MultiHostCheckpoint.load(ckpt_path, proc_id)
            )
    msgs.extend(dec.drain())  # dispatch-ahead: last batch completes here

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
        json.dump(
            {
                "process": proc_id,
                "messages": records,
                "metrics": {
                    k: (
                        v + prior_metrics.get(k, 0)
                        if isinstance(v, (int, float))
                        and isinstance(prior_metrics.get(k, 0), (int, float))
                        else v
                    )
                    for k, v in dec._local.metrics.snapshot().items()
                },
            },
            f,
        )
    print(f"process {proc_id}: {len(records)} messages", file=sys.stderr)


if __name__ == "__main__":
    main()
