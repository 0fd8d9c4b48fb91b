"""Multi-device mesh decode tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 4): packets planted exactly on shard boundaries must be
recovered once and only once (halo exchange + global dedup)."""

import jax
import numpy as np
import pytest

from rtlamr_tpu.parallel.mesh import MeshDecoder, dryrun
from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.ref import ReferenceDecoder, synth

CHIP = 8  # smallest chip length keeps shapes tiny on CPU


def parsers(names):
    return [new_parser(n, CHIP) for n in names]


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun(n):
    # scm + idm + r900 in noise, a shard-boundary packet, and a
    # super-batch-boundary packet => 5 messages, each exactly once.
    assert dryrun(n) == 5


def test_mesh_matches_oracle_boundary_packets():
    """Packets on every shard boundary decode identically to the oracle."""
    ps = parsers(["scm"])
    n_dev = 4
    dec = MeshDecoder(ps, devices=jax.devices()[:n_dev], window_blocks=None)
    cfg = dec.cfg
    w = dec.spec.window
    scm_len = 96 * cfg.symbol_length
    bursts = []
    for i in range(1, n_dev):
        bits = synth.make_scm_bits(meter_id=1000 + i, consumption=i)
        bursts.append(synth.bits_to_burst(bits, i * w - scm_len // 2))
    iq = synth.render_iq(n_dev * w, bursts, CHIP, noise=2.0, seed=9)

    got = [(b, str(m)) for b, m in dec.decode_capture(iq)]
    want = [
        (b, str(m))
        for b, m in ReferenceDecoder(
            parsers(["scm"]), arithmetic="int"
        ).decode_capture(iq)
    ]
    assert got == want
    assert len(got) == n_dev - 1


def test_mesh_multi_superwindow_carry():
    """The carry between super-windows preserves packets straddling the
    super-window boundary (shard n-1 -> shard 0 of the next step)."""
    ps = parsers(["scm"])
    n_dev = 2
    dec = MeshDecoder(ps, devices=jax.devices()[:n_dev], window_blocks=None)
    cfg = dec.cfg
    w = dec.spec.window
    super_w = n_dev * w
    scm_len = 96 * cfg.symbol_length
    bits = synth.make_scm_bits(meter_id=5555, consumption=3)
    iq = synth.render_iq(
        2 * super_w,
        [synth.bits_to_burst(bits, super_w - scm_len // 2)],
        CHIP,
    )
    got = dec.decode_capture(iq)
    assert [(m.meter_id()) for _, m in got] == [5555]


def test_mesh_all_protocols():
    names = ["scm", "scm+", "idm", "r900"]
    ps = parsers(names)
    dec = MeshDecoder(ps, devices=jax.devices()[:2], window_blocks=None)
    cfg = dec.cfg
    w = dec.spec.window
    bursts = [
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=42), cfg.block_size // 2
        ),
        synth.r900_burst(
            synth.make_r900_symbols(meter_id=98765), w + cfg.block_size
        ),
    ]
    # Search positions lag the samples by PacketLength (the reference's
    # history-buffer scheme), so leave >= PacketLength of tail room.
    iq = synth.render_iq(4 * w, bursts, CHIP)
    got = sorted(m.msg_type() for _, m in dec.decode_capture(iq))
    assert got == ["R900", "SCM"]
