"""Micro-probe: cost of the pre-slice edge index (_edge_index) stages.

Times on the real chip: D build, group-8 sum, cumsum, Wexc passes, and the
full search_slice with variants (no index / csg8 only / full), to find where
the ~0.5 ms regression vs the widened-query variant lives.
"""

import functools
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)


def _tiny_fetch(res):
    import jax

    leaf = jax.tree_util.tree_leaves(res)[0]
    np.asarray(leaf.reshape(-1)[:8])


def _ms_slope(fn, n_small=4, n_big=16, trials=5):
    r = fn()
    _tiny_fetch(r)

    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn()
        _tiny_fetch(r)
        return (time.perf_counter() - t0) * 1e3

    vals = []
    for _ in range(trials):
        a = run(n_small)
        b = run(n_big)
        vals.append((b - a) / (n_big - n_small))
    return float(np.median(vals))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import (
        _edge_index,
        _strided_matrix,
        frontend_stage_staged,
        staged_geometry,
    )
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.protocols.r900 import PAYLOAD_SYMBOLS

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=1024, max_hits=256,
                        backend="pallas")
    spec = dec.spec
    geo = staged_geometry(spec)
    w = spec.window
    iq = build_capture(dec.cfg, 1, w, spec.halo)
    full = np.zeros(geo.staged_samples, np.uint16)
    u16 = iq.view(np.uint16)
    full[spec.pad_shift : spec.pad_shift + u16.size] = u16
    win0 = jax.device_put(jnp.asarray(full))
    false_ = jnp.asarray(False)

    fe = jax.jit(functools.partial(frontend_stage_staged, spec))
    bits, q6, mask2d = fe(win0, false_)
    _tiny_fetch(bits)

    sl = spec.symbol_length
    cl = spec.chip_length
    max_bytes = max((g.packet_symbols + 7) >> 3 for g in spec.groups)

    mk_bit = jax.jit(lambda b: _strided_matrix(b, sl, 8 * max_bytes + 8))
    mk_q6 = jax.jit(lambda q: _strided_matrix(q, 4 * cl, PAYLOAD_SYMBOLS))
    bit_mat = mk_bit(bits)
    q6_mat = mk_q6(q6)
    _tiny_fetch(bit_mat)
    print(f"bit_mat {bit_mat.shape} q6_mat {q6_mat.shape}", file=sys.stderr)

    print(f"strided bit_mat: {_ms_slope(lambda: mk_bit(bits)):.3f} ms",
          file=sys.stderr)
    print(f"strided q6_mat:  {_ms_slope(lambda: mk_q6(q6)):.3f} ms",
          file=sys.stderr)

    ei_b = jax.jit(_edge_index)
    print(f"edge_index(bit_mat): {_ms_slope(lambda: ei_b(bit_mat)):.3f} ms",
          file=sys.stderr)
    print(f"edge_index(q6_mat):  {_ms_slope(lambda: ei_b(q6_mat)):.3f} ms",
          file=sys.stderr)

    # Stage decomposition on bit_mat.
    def d_only(mat):
        stride, c = mat.shape
        c8 = (-(-c // 8)) * 8 + 8
        mat = jnp.concatenate(
            [mat, jnp.zeros((stride, c8 - c), mat.dtype)], axis=1
        )
        nxt = jnp.concatenate([mat[1:], mat[:1]], axis=0)
        d = (mat != nxt).astype(jnp.uint8)
        row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        return jnp.where(row == stride - 1, jnp.uint8(1), d)

    d_j = jax.jit(d_only)
    d = d_j(bit_mat)
    _tiny_fetch(d)
    print(f"  D build: {_ms_slope(lambda: d_j(bit_mat)):.3f} ms",
          file=sys.stderr)

    def g8(d):
        stride, c8 = d.shape
        return jnp.sum(d.reshape(stride, c8 // 8, 8), axis=2,
                       dtype=jnp.int32)

    g8_j = jax.jit(g8)
    dg = g8_j(d)
    _tiny_fetch(dg)
    print(f"  group8 sum: {_ms_slope(lambda: g8_j(d)):.3f} ms",
          file=sys.stderr)

    cs_j = jax.jit(lambda dg: jnp.cumsum(dg, axis=1))
    print(f"  cumsum(dg): {_ms_slope(lambda: cs_j(dg)):.3f} ms",
          file=sys.stderr)

    def wexc(d):
        stride, c8 = d.shape
        col8 = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) % 8
        x = d
        for s in (1, 2, 4):
            shifted = jnp.pad(x, ((0, 0), (s, 0)))[:, :-s]
            x = x + jnp.where(col8 >= s, shifted, 0).astype(jnp.uint8)
        return x - d

    w_j = jax.jit(wexc)
    print(f"  wexc passes: {_ms_slope(lambda: w_j(d)):.3f} ms",
          file=sys.stderr)

    # Alternative group8: matmul against an 8->1 ones vector via reshape to
    # (stride*c8//128, 128) then segment... skipped; try strided-slice sum.
    def g8_slices(d):
        acc = d[:, 0::8].astype(jnp.int32)
        for j in range(1, 8):
            acc = acc + d[:, j::8]
        return acc

    g8s_j = jax.jit(g8_slices)
    print(f"  group8 strided-slices: {_ms_slope(lambda: g8s_j(d)):.3f} ms",
          file=sys.stderr)

    print(json.dumps({"ok": True}) if False else "done")


if __name__ == "__main__":
    main()
