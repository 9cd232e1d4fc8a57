"""Microbenchmark: lowering strategies for the DLA-34 early levels.

The 16/32-channel early trunk levels underfeed the 128-lane MXU
(BENCH.md "Roofline context": trunk at ~34% of its int8 roof, early
levels the floor), and space-to-depth stem folds measured SLOWER
end-to-end (layout passes eat the MXU gain).  This probe times the one
lowering not yet measured — explicit im2col (patches + matmul, which
lifts the contraction dim from C_in to 9*C_in = 144/288) — against the
native XLA conv at exactly the early-level shapes, so the "pack the
early levels" question is settled by data in one chip-minute.

  python -m tauv_vision_tpu.scripts.early_conv_probe [batch]

Each timing uses bench.py's N-vs-2N chained-scan methodology (the
relay's async dispatch makes naive timing wrong; see BENCH.md
"Methodology").
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

SHAPES = (
    # (name, H, W, C_in, C_out) — DLA-34 early levels at 640x360
    ("level0", 360, 640, 16, 16),
    ("level1_down", 180, 320, 16, 32),
    ("level1", 180, 320, 32, 32),
    ("level2", 90, 160, 64, 64),
)


def main():
    batch = next((int(a) for a in sys.argv[1:] if a.isdigit()), 32)

    import jax
    import jax.numpy as jnp

    def timeit(fn, *args, n=8, reps=2):
        @functools.partial(jax.jit, static_argnums=len(args))
        def chained(*a):
            n_ = a[-1]
            a = a[:-1]

            def body(carry, _):
                out = fn(a[0] + carry, *a[1:])
                total = out.astype(jnp.float32).sum()
                return (total.astype(jnp.int32) % 2).astype(a[0].dtype), total

            _, totals = jax.lax.scan(
                body, jnp.zeros((), a[0].dtype), None, length=n_
            )
            return totals.sum()

        def run(n_):
            float(chained(*args, n_))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chained(*args, n_))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return max(run(2 * n) - run(n), 1e-9) / n

    rows = []
    for name, h, w, cin, cout in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(batch, h, w, cin)).astype(
            np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(
            np.float32) * 0.1).astype(jnp.bfloat16)

        def xla_conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def im2col(x, k):
            # patches: [B, H, W, C*9] (SAME padding), then one matmul
            # with contraction 9*C_in — 144/288 wide vs 16/32.
            p = jax.lax.conv_general_dilated_patches(
                x, (3, 3), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            kk = k.transpose(2, 0, 1, 3).reshape(-1, k.shape[-1])
            return jnp.einsum(
                "bhwk,ko->bhwo", p, kk,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)

        # numerics guard (CPU/TPU both fine at bf16 tolerance)
        ref = np.asarray(xla_conv(x[:1], k), np.float32)
        alt = np.asarray(im2col(x[:1], k), np.float32)
        err = float(np.abs(ref - alt).max() / (np.abs(ref).max() + 1e-9))

        t_conv = timeit(xla_conv, x, k)
        t_im2col = timeit(im2col, x, k)
        gflop = 2 * batch * h * w * 9 * cin * cout / 1e9
        rows.append({
            "shape": name, "batch": batch,
            "xla_conv_ms": round(t_conv * 1e3, 3),
            "im2col_ms": round(t_im2col * 1e3, 3),
            "xla_tflops": round(gflop / t_conv / 1e3, 1),
            "im2col_tflops": round(gflop / t_im2col / 1e3, 1),
            "rel_err": round(err, 6),
        })
        print(rows[-1], flush=True)

    print(json.dumps({"batch": batch, "rows": rows}))


if __name__ == "__main__":
    main()
