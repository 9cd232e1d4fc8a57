"""Standalone cost of the CN IDA stage's depthwise upsamples (chip).

The north-star CN profile (BENCH.md round 3) charges 15.0 ms to the
DLAUp/IDAUp aggregation stage at ~63% MXU; its proj/node convs roof at
~9.4 ms, so up to ~5.6 ms rides on the five bilinear depthwise
upsamples (models/centerpoint_dla.DepthwiseUpsample, dilated lowering)
plus layout friction.  This probe times each REAL upsample instance of
the 640x360 DLA-34 graph standalone (dilated form, bf16, batch 128) so
the round-4 lever decision (Pallas NHWC depthwise-upsample kernel vs
leave it) rests on a measured prize, not the subtraction estimate.

Zero-free VPU floor for comparison: every phase of a k=2f s=f bilinear
upsample has exactly 2x2 taps, so the floor is 4 FMA/output element
(~1.2 Tel-FMA/s measured VPU f32 bound on this chip).

  python -m tauv_vision_tpu.scripts.ida_upsample_probe [batch]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


# (name, in_h, in_w, channels, factor, count_in_graph) — the DLAUp
# cascade + final IDAUp instances for 640x360 DLA-34 first_level=2
# (models/centerpoint_dla.DLAUp/DLASeg; shapes: l2 90x160x64,
# l3 45x80x128, l4 23x40x256, l5 12x20x512, ups run on the projected
# out_channels).
INSTANCES = (
    ("dlaup0_f2_12x20x256", 12, 20, 256, 2, 1),
    ("dlaup1_f2_23x40x128", 23, 40, 128, 2, 2),
    ("dlaup2_f2_45x80x64", 45, 80, 64, 2, 3),
    ("ida_f2_45x80x64", 45, 80, 64, 2, 1),
    ("ida_f4_23x40x64", 23, 40, 64, 4, 1),
)


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)

    def timed(fn, inp, n_chain=16, n_reps=2):
        @functools.partial(jax.jit, static_argnums=1)
        def chained(v, n):
            def body(carry, _):
                out = fn(v + carry)
                total = out.astype(jnp.float32).sum()
                return (total.astype(jnp.int32) % 2).astype(v.dtype), total

            _, totals = jax.lax.scan(
                body, jnp.zeros((), v.dtype), None, length=n
            )
            return totals.sum()

        def run(n):
            float(chained(inp, n))
            ts = []
            for _ in range(n_reps):
                t0 = time.perf_counter()
                float(chained(inp, n))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t1 = run(n_chain)
        t2 = run(2 * n_chain)
        return max(t2 - t1, 1e-9) / n_chain

    def dilated_up(x, kernel, f):
        k = 2 * f
        pad = k - 1 - f // 2
        flipped = jnp.flip(kernel, axis=(0, 1))
        return jax.lax.conv_general_dilated(
            x, flipped, (1, 1), ((pad, pad), (pad, pad)),
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )

    rows = []
    total_ms = 0.0
    total_els = 0
    for name, h, w, c, f, count in INSTANCES:
        x = jnp.asarray(
            rng.standard_normal((batch, h, w, c)) * 0.1, jnp.bfloat16
        )
        kern = jnp.asarray(
            rng.standard_normal((2 * f, 2 * f, 1, c)) * 0.05, jnp.bfloat16
        )
        t = timed(functools.partial(dilated_up, kernel=kern, f=f), x)
        out_els = batch * (f * h) * (f * w) * c
        floor_ms = 4 * out_els / 1.2e12 * 1e3
        rows.append({
            "instance": name, "count": count,
            "ms_each": round(t * 1e3, 3),
            "ms_total": round(t * 1e3 * count, 3),
            "vpu_floor_ms_each": round(floor_ms, 3),
        })
        total_ms += t * 1e3 * count
        total_els += out_els * count
        print(rows[-1], flush=True)

    floor_total = 4 * total_els / 1.2e12 * 1e3
    print(json.dumps({
        "batch": batch,
        "rows": rows,
        "dilated_total_ms": round(total_ms, 2),
        "vpu_floor_total_ms": round(floor_total, 2),
        "prize_ceiling_ms": round(total_ms - floor_total, 2),
    }))


if __name__ == "__main__":
    main()
