"""Gather-lowering probe: strided element gathers vs contiguous slice
gathers for the candidate slicing step (SEARCH_STAGES follow-up: the
gathers are 3.54 of search_slice's 4.35 ms).

Current: packed bytes gathered as (k, nbytes) flat element takes with
stride-8 column offsets. Candidate: gather each candidate's RAW BIT run
as one contiguous (1, n_sym) slice of the strided matrix (a gather of
slices — embedding-lookup-shaped), then bit-pack after the gather.

Usage: python tools/gather_probe.py
Writes GATHER_PROBE.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools.roofline_bench import _ms_slope, _tiny_fetch  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    STRIDE = 144  # symbol length at chip 72
    C = 60000  # strided-matrix columns at the bench window
    K = 2048  # gather capacity
    NSYM = 736  # idm group symbols (the widest)

    rng = np.random.default_rng(0)
    mat = jax.device_put(
        jnp.asarray(rng.integers(0, 2, (STRIDE, C), dtype=np.uint8))
    )
    p8 = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (STRIDE, C // 8 * 8), dtype=np.uint8))
    )
    starts = jax.device_put(
        jnp.asarray((rng.integers(0, 8_000_000, K)).astype(np.int32))
    )
    _tiny_fetch(mat)

    out = {}

    def rep(name, ms):
        out[name] = round(ms, 3)
        print(f"{name:>26}: {ms:8.3f} ms", file=sys.stderr)

    # Current scheme: flat element take of (K, nbytes) per group.
    from rtlamr_tpu.ops.frontend import _packed_rows_from, _strided_rows_from

    @jax.jit
    def current(p8_, st):
        a = _packed_rows_from(p8_, st, STRIDE, 12)
        b = _packed_rows_from(p8_, st, STRIDE, 16)
        c = _packed_rows_from(p8_, st, STRIDE, 92)
        d = _strided_rows_from(p8_, st, STRIDE, 42)  # stand-in for syms
        e = _strided_rows_from(p8_, st, STRIDE, 15)
        return a, b, c, d, e

    rep("current_element_takes", _ms_slope(lambda: current(p8, starts)))

    # Candidate: ONE contiguous (1, NSYM) slice gather per candidate from
    # the bit matrix, shared across groups (every group's symbols are a
    # prefix), then bit-pack after.
    def slice_gather(m, st, width):
        r = (st % STRIDE).astype(jnp.int32)
        c = (st // STRIDE).astype(jnp.int32)
        idx = jnp.stack([r, c], axis=-1)  # (K, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1),
        )
        return jax.lax.gather(
            m, idx, dn, slice_sizes=(1, width),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (K, width)

    @jax.jit
    def slices(m, st):
        bits = slice_gather(m, st, NSYM)  # (K, 736) u8 — shared
        # bit-pack to the widest group; narrower groups slice the prefix.
        w = jnp.asarray(
            np.array([128, 64, 32, 16, 8, 4, 2, 1], np.int32)
        )
        packed = (
            bits.reshape(K, NSYM // 8, 8).astype(jnp.int32) * w
        ).sum(-1).astype(jnp.uint8)
        syms = slice_gather(m, st, 42)  # r900 symbol stand-in
        return packed, syms

    rep("slice_gather_plus_pack", _ms_slope(lambda: slices(mat, starts)))

    # Separate costs:
    g = jax.jit(lambda m, st: slice_gather(m, st, NSYM))
    rep("slice_gather_only", _ms_slope(lambda: g(mat, starts)))

    with open(os.path.join(_REPO, "GATHER_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
