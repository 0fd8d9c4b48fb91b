"""Wideband u8-requantization fidelity sweep (VERDICT r3 item 7a).

The wideband path requantizes each channelized stream back to the rtl-sdr
u8 grid (ops/channelizer.requantize_u16, the decode.go:209-216 convention)
before the shared integer decode program. This tool quantifies what that
extra quantization step costs in recall: for each SNR point it channelizes
the SAME wideband capture once, then decodes every channel twice with an
IDENTICAL float matched-filter decoder —

  float path: the raw f32 channelizer output (the hypothetical
              float-channel decoder),
  u8 path:    the channelizer output after round+clip to the u8 grid and
              back (exactly the production path's only lossy step)

— so any recall difference is attributable to requantization alone. A
third column runs the actual production WidebandDecoder end-to-end as a
sanity check of the u8-path model.

Writes WIDEBAND_FIDELITY.json at the repo root. CPU-friendly (chip 8,
4 channels).

Usage: python tools/wideband_fidelity.py [packets_per_point=24]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

CHIP = 8
N_CH = 4


def decode_scm_float(i: np.ndarray, q: np.ndarray, cfg) -> set:
    """Minimal float-arithmetic SCM decoder over one channel stream.

    Same math as the integer engine (magnitude -> cumsum -> Manchester
    sign bits -> exact preamble match at stride SL -> slice -> BCH CRC,
    decode.go:199-375 / scm/scm.go:61-91) but in float64 on the raw
    channel values — the quantization-free yardstick. Returns the set of
    CRC-valid SCM meter IDs found.
    """
    from rtlamr_tpu.utils.bits import pack_bits
    from rtlamr_tpu.utils.crc import crc16_batch

    cl, sl = cfg.chip_length, cfg.symbol_length
    pre = "111110010101001100000"
    n_sym = 96
    mag = i * i + q * q
    cs = np.concatenate([np.zeros(1), np.cumsum(mag, dtype=np.float64)])
    span = n_sym * sl
    lp = mag.size - span - sl
    if lp <= 0:
        return set()
    f = 2 * cs[cl : cl + lp] - cs[:lp] - cs[sl : sl + lp]
    bits = (f >= 0).astype(np.uint8)
    acc = np.ones(lp - span, dtype=bool)
    for k, b in enumerate(pre):
        acc &= bits[k * sl : k * sl + lp - span] == int(b)
    ids = set()
    hits = np.nonzero(acc)[0]
    if hits.size == 0:
        return ids
    sym = np.stack([bits[h : h + span : sl] for h in hits])
    packed = pack_bits(sym)
    ok = crc16_batch(packed[:, 2:12], 0, 0x6F63) == 0
    for row in packed[ok]:
        pb = np.unpackbits(row)
        # scm.go:104-109: ID = bits[21:23] ++ bits[56:80] (26 bits)
        ert = (
            (int(pb[21]) << 25 | int(pb[22]) << 24)
            | int("".join(map(str, pb[56:80])), 2)
        )
        if ert:
            ids.add(ert)
    return ids


def one_point(amplitude: float, n_packets: int, seed: int) -> dict:
    import jax.numpy as jnp

    from rtlamr_tpu.ops.channelizer import (
        ChannelizerSpec,
        channelize,
        iq_bytes_to_frames,
    )
    from rtlamr_tpu.parallel.wideband import WidebandDecoder
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.ref import synth

    parsers = [new_parser("scm", CHIP)]
    dec = WidebandDecoder(parsers, n_channels=N_CH, window_blocks=24)
    cfg = dec.cfg
    w = dec.spec.window

    rng = np.random.default_rng(seed)
    pkt_len = 96 * cfg.symbol_length
    total = 0
    planted = []
    bursts = []
    off = cfg.block_size
    for k in range(n_packets):
        ch = int(rng.integers(0, N_CH))
        mid = 5_000_000 + k
        bursts.append(
            (ch, synth.bits_to_burst(
                synth.make_scm_bits(meter_id=mid, consumption=k), off))
        )
        planted.append((ch, mid))
        off += pkt_len + cfg.block_size
    total = ((off + dec.spec.halo) // w + 2) * w
    wb = synth.render_wideband(
        total, bursts, N_CH, CHIP,
        amplitude=amplitude, noise=2.0, seed=seed,
    )

    # Channelize once (stream-chunked exactly like the decoder).
    spec = dec.chspec
    hist = jnp.zeros((2, N_CH, spec.history_frames), jnp.float32)
    chunk_bytes = 2 * N_CH * w
    chans = []
    for lo in range(0, len(wb), chunk_bytes):
        frames = iq_bytes_to_frames(spec, jnp.asarray(wb[lo : lo + chunk_bytes]))
        chans.append(np.asarray(channelize(spec, hist, frames)))
        hist = frames[:, :, frames.shape[2] - spec.history_frames :]
    ch_f = np.concatenate(chans, axis=2)  # (2, N, F) float channels

    # u8 path: round+clip to the u8 grid and back (the production path's
    # only lossy step; requantize_u16 semantics).
    iu = np.clip(np.round(ch_f[0] + 127.5), 0, 255) - 127.5
    qu = np.clip(np.round(ch_f[1] + 127.5), 0, 255) - 127.5

    found_f, found_u = set(), set()
    for c in range(N_CH):
        found_f |= {(c, m) for m in decode_scm_float(
            ch_f[0, c].astype(np.float64), ch_f[1, c].astype(np.float64), cfg)}
        found_u |= {(c, m) for m in decode_scm_float(
            iu[c].astype(np.float64), qu[c].astype(np.float64), cfg)}

    # Production end-to-end sanity column.
    prod = {(c, m.meter_id()) for c, _b, m in dec.decode_capture(wb)}

    want = set(planted)
    return {
        "amplitude": amplitude,
        "snr_db": round(20 * np.log10(amplitude / 2.0), 1),
        "planted": n_packets,
        "recall_float": round(len(found_f & want) / n_packets, 4),
        "recall_u8": round(len(found_u & want) / n_packets, 4),
        "recall_production": round(len(prod & want) / n_packets, 4),
        "lost_to_requantization": len(found_f & want) - len(found_u & want),
    }


def main() -> None:
    n_packets = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    import jax

    jax.config.update("jax_platforms", "cpu")

    points = []
    for amp in (2.0, 2.5, 3.0, 3.5, 4.0, 5.0, 7.0, 10.0, 20.0, 90.0):
        p = one_point(amp, n_packets, seed=int(amp * 10))
        points.append(p)
        print(p, file=sys.stderr)

    total_lost = sum(p["lost_to_requantization"] for p in points)
    result = {
        "metric": "wideband_requantization_recall_cost",
        "value": total_lost,
        "unit": "packets lost to u8 requantization across the sweep",
        "points": points,
        "method": "identical float decoder on raw f32 channels vs the same channels after round+clip to the u8 grid; production WidebandDecoder as sanity column",
        "noise_sigma": 2.0,
    }
    with open(os.path.join(_REPO, "WIDEBAND_FIDELITY.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
