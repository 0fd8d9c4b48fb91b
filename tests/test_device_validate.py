"""Device-side batched checksum gates (SURVEY §2 C9/C10 build targets).

Parity of the in-program CRC-16 / GF(32) RS kernels against the NumPy batch
implementations (utils/crc.py, utils/gf.py), and the behavioral payoff: a
noise-plateau storm that used to overflow the max_hits compaction no longer
escalates, because only checksum-valid candidates occupy result slots.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rtlamr_tpu.ops.frontend import (  # noqa: E402
    _crc16_batch_jnp,
    _r900_rs_valid_jnp,
)
from rtlamr_tpu.utils.crc import crc16_batch  # noqa: E402
from rtlamr_tpu.utils.gf import rs_syndromes_batch  # noqa: E402


@pytest.mark.parametrize(
    "init,poly",
    [(0x0000, 0x6F63), (0xFFFF, 0x1021), (0xFFFF, 0x8005)],
)
def test_crc16_device_parity(init, poly):
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size=(257, 92), dtype=np.uint8)
    want = crc16_batch(data, init, poly)
    got = np.asarray(_crc16_batch_jnp(jnp.asarray(data), init, poly))
    np.testing.assert_array_equal(got.astype(np.uint16), want)


def test_r900_rs_device_parity():
    from rtlamr_tpu.ref import synth

    rng = np.random.default_rng(12)
    # Mix of valid codewords (synth parity) and random noise digits.
    rows = []
    for i in range(64):
        if i % 3 == 0:
            rows.append(synth.make_r900_symbols(meter_id=100000 + i))
        else:
            rows.append(rng.integers(0, 6, size=42, dtype=np.uint8))
    syms = np.stack(rows)

    # Host reference: base-6 range + batch syndromes (r900/r900.go:199-221).
    pairs = syms.astype(np.int64).reshape(-1, 21, 2)
    sym5 = pairs[:, :, 0] * 6 + pairs[:, :, 1]
    in_range = ~(sym5 > 31).any(axis=1)
    cw = np.zeros((syms.shape[0], 31), np.uint8)
    cw[:, :16] = sym5[:, :16] & 31
    cw[:, 26:] = sym5[:, 16:] & 31
    want = in_range & ~rs_syndromes_batch(cw, 5, 29).any(axis=1)

    got = np.asarray(_r900_rs_valid_jnp(jnp.asarray(syms)))
    np.testing.assert_array_equal(got, want)
    assert want.any() and not want.all()  # both classes exercised


def _storm_capture(cfg, spec):
    """One window with ~25x more preamble-plateau candidates than max_hits
    allows: preamble-only bursts (valid preamble, garbage body -> CRC
    fails) plus one real SCM packet."""
    from rtlamr_tpu.ref import synth

    w = spec.window
    total = spec.halo + w
    sl = cfg.symbol_length
    pre_bits = np.concatenate(
        [synth.make_scm_bits(meter_id=1, consumption=1)[:21], [1] * 4]
    )
    bursts = []
    # Preamble-only bursts spaced well clear of each other.
    off = spec.halo + cfg.block_size // 4
    scm_len = 96 * sl
    for i in range(10):
        bursts.append(synth.bits_to_burst(pre_bits, off))
        off += 40 * sl
    bursts.append(
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=777777, consumption=9), off
        )
    )
    assert off + scm_len < total
    return synth.render_iq(total, bursts, cfg.chip_length, noise=2.0, seed=5)


def test_storm_no_escalation_with_device_validate():
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.protocols import new_parser

    def run(device_validate):
        parsers = [new_parser("scm", 8)]
        dec = WindowDecoder(parsers, window_blocks=16, max_hits=8)
        if not device_validate:
            import dataclasses

            dec.spec = dataclasses.replace(dec.spec, device_validate=False)
        iq = _storm_capture(dec.cfg, dec.spec)
        # Feed body only (capture includes the halo head for planting room).
        msgs = dec.decode_capture(iq)
        return msgs, dec.metrics.hit_overflows

    msgs_on, overflows_on = run(True)
    msgs_off, overflows_off = run(False)
    assert [(b, str(m)) for b, m in msgs_on] == [
        (b, str(m)) for b, m in msgs_off
    ]
    assert any(m.meter_id() == 777777 for _, m in msgs_on)
    # The storm overflows the 8-slot compaction without the device gate...
    assert overflows_off > 0
    # ...and stays entirely on the fast path with it.
    assert overflows_on == 0


def test_pvalid_bitmask_matches_host_valid_mask():
    """The device-shipped per-parser verdict bitmask (ops/frontend pvalid)
    equals each parser's host valid_mask over the surviving rows — the
    contract that lets _parse_window skip the host CRC/RS recomputation
    (VERDICT r5 parse path)."""
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import run_window
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.ref import synth

    names = ("scm", "scm+", "idm", "netidm", "r900", "r900bcd")
    parsers = [new_parser(n, 8) for n in names]
    dec = WindowDecoder(parsers, window_blocks=64, backend="jnp")
    spec = dec.spec
    w = spec.window
    # run_window consumes the first `halo` samples as (zeroed) history;
    # plant everything past it, inside the window's search span.
    h = spec.halo
    bursts = [
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111111, consumption=1), h + 500),
        synth.bits_to_burst(
            synth.make_scmplus_bits(endpoint_id=222222, consumption=2),
            h + 4000),
        synth.bits_to_burst(
            synth.make_idm_bits(serial=333333), h + 8000),
        synth.r900_burst(
            synth.make_r900_symbols(meter_id=444444), h + 21000),
    ]
    iq = synth.render_iq(w + spec.halo, bursts, 8, noise=2.0, seed=3)
    res = run_window(spec, iq, first=True)
    checked = 0
    for g, gspec in enumerate(spec.groups):
        count = int(res["counts"][g][1])
        if count == 0:
            continue
        data = res["bytes"][g][:count]
        syms = res["symbols"].get(g)
        if syms is not None:
            syms = syms[:count]
        pv = res["pvalid"][g][:count]
        group_parsers = dec._group_parsers[g]
        for j, p in enumerate(group_parsers):
            host = p.valid_mask(data, syms)
            dev = ((pv >> j) & 1).astype(bool)
            np.testing.assert_array_equal(dev, host, err_msg=f"g{g} p{j}")
            checked += 1
    assert checked >= 4  # every group produced candidates to compare
