"""Engine loop at scan K=24/32 (fetch amortization asymptote)."""
import json, os, sys, time
import numpy as np
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
from tools.roofline_bench import _tiny_fetch

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import staged_geometry
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=1024, max_hits=256, backend="pallas")
    spec = dec.spec
    geo = staged_geometry(spec)
    w = spec.window
    iq = build_capture(dec.cfg, 32, w, spec.halo)
    full = np.zeros(31 * w + geo.staged_samples, np.uint16)
    u16 = iq.view(np.uint16)
    full[spec.pad_shift : spec.pad_shift + u16.size] = u16
    b32 = jax.device_put(jnp.asarray(np.stack(
        [full[i * w : i * w + geo.staged_samples] for i in range(32)])))
    _tiny_fetch(b32)
    out = {}
    for k in (24, 32):
        bk = b32[:k]
        dec.reset(); dec._first = False
        dec.decode_staged_batch(bk); dec.drain()
        dec.reset(); dec._first = False
        n_iter = 0
        start = time.perf_counter()
        while time.perf_counter() - start < 10.0 or n_iter < 3 * k:
            dec.decode_staged_batch(bk, drain=False); n_iter += k
        dec.drain()
        rate = n_iter * w / (time.perf_counter() - start)
        out[f"engine_k{k}_MSps"] = round(rate / 1e6, 1)
        print(f"engine K={k}: {rate/1e6:.1f} MS/s", file=sys.stderr)
    json.dump(out, open(os.path.join(_REPO, "SCAN_K_PROBE_k2432.json"), "w"), indent=1)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
