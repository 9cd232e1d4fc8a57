"""Interleaved decomposition probe for the Pallas DCN kernel.

The bounded-offset DCN kernel (ops/pallas/deform_conv.py) measures far
above its VMEM-traffic floor (~27.7 ms for one 90x160x64 layer at
batch 64 and r=1, vs a ~2 ms VPU-arithmetic estimate), and the serving
target (--deform >= 400 fps, VERDICT r2) needs that gap closed.  This
probe times three kernel variants INTERLEAVED in one process (chip
drift cancels; scripts/heads_ab_probe.py discipline) at the dominant
production shape:

- ``full``      — the exactness-tested f32-hat kernel (serving today);
- ``bf16_hat``  — sampling arithmetic in bf16 (2x VPU rate, half the
                  rotation/broadcast traffic); decoded-impact rung;
- ``const_hat`` — scalar hat weights, same FMA structure: the delta
                  full - const_hat isolates the per-tap hat math +
                  offset lane-broadcast cost from the FMA core.

  python -m tauv_vision_tpu.scripts.dcn_kernel_probe [batch] [rounds]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

SHAPES = [
    # (h, w, c, o, max_offset) — 90x160x64 is ~70% of the DCN-IDA
    # sampling work (BENCH.md); r=0.5 is the bounded serving radius,
    # r=1 the wider-bound variant.
    (90, 160, 64, 64, 0.5),
    (90, 160, 64, 64, 1.0),
]

VARIANTS = ("full", "lerp", "const_hat")
# Round 4 adds "lerp2": select-free narrow-hat restructure — hat
# weights computed on narrow [H, wb, n_pack] planes and folded with the
# mask, reaching the lanes through one broadcast+reshape each; per tap
# 12 lane-wide mul/FMAs + 6 broadcasts vs lerp's ~16 ops + 3 pack-muxed
# broadcasts.  Select arms with --variants a,b,c.
# Round-1 decomposition at r=0.5 (this chip): full 20.25 ms, bf16_hat
# 28.05 ms (SLOWER — the VPU computes in f32, the converts dominate;
# arm dropped), const_hat 12.75 ms (hat math + offset broadcasts are
# ~37%; the FMA core + rotations + matmuls carry the rest).  "lerp"
# (sign-selected bilinear, exact for |d| <= 1, per-tap cost constant
# in radius) replaces the hat window entirely.


def main() -> None:
    ints = [a for a in sys.argv[1:] if a.replace(".", "").isdigit()]
    batch = int(ints[0]) if ints else 64
    rounds = int(ints[1]) if len(ints) > 1 else 3
    variants = VARIANTS
    if "--variants" in sys.argv:
        i = sys.argv.index("--variants")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--variants requires a comma-separated value")
        variants = tuple(sys.argv[i + 1].split(","))
        known = ("full", "lerp", "lerp2", "bf16_hat", "const_hat")
        bad = [v for v in variants if v not in known]
        if bad:
            raise SystemExit(f"unknown variant(s) {bad}; known: {known}")

    import pathlib

    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tauv_vision_tpu.ops.pallas.deform_conv import deform_conv2d_pallas

    rng = np.random.default_rng(0)

    def make_case(h, w, c, o, r, variant):
        x = jnp.asarray(
            rng.standard_normal((batch, h, w, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        offset = jnp.asarray(
            rng.uniform(-r, r, (batch, h, w, 18)).astype(np.float32)
        )
        mask = jnp.asarray(
            rng.uniform(0, 1, (batch, h, w, 9)).astype(np.float32)
        ).astype(jnp.bfloat16)
        weight = jnp.asarray(
            (rng.standard_normal((3, 3, c, o)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnums=1)
        def chained(x, n_):
            def body(carry, _):
                out = deform_conv2d_pallas(
                    x + carry, offset, mask, weight, None,
                    padding=1, max_offset=r, variant=variant,
                )
                total = out.astype(jnp.float32).sum()
                return total.astype(x.dtype) * 1e-12, total

            _, totals = jax.lax.scan(
                body, jnp.zeros((), x.dtype), None, length=n_
            )
            return totals.sum()

        return x, chained

    def timeit(x, chained, n=8, reps=2):
        def run(n_):
            float(chained(x, n_))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chained(x, n_))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return max(run(2 * n) - run(n), 1e-9) / n

    cases = {}
    for h, w, c, o, r in SHAPES:
        for v in variants:
            cases[f"r{r}/{v}"] = make_case(h, w, c, o, r, v)

    results = {k: [] for k in cases}
    for rd in range(rounds):
        for key, (x, fn) in cases.items():
            t = timeit(x, fn)
            results[key].append(t)
            print({"round": rd, "case": key, "ms": round(t * 1e3, 3)},
                  flush=True)

    summary = {
        k: {"ms_median": round(float(np.median(v)) * 1e3, 3),
            "ms_all": [round(x * 1e3, 3) for x in v]}
        for k, v in results.items()
    }
    print(json.dumps({"batch": batch, "rounds": rounds, "cases": summary}))


if __name__ == "__main__":
    main()
