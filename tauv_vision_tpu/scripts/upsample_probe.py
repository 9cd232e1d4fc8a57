"""Microbenchmark: depthwise bilinear upsample lowerings at the IDA/DLA
shapes.

models/centerpoint_dla.DepthwiseUpsample currently lowers to a dilated
depthwise correlation; the phase decomposition
(ops/conv_transpose.conv_transpose_phase) was measured SLOWER when
switched for EVERY upsample (CenterNet 2748 -> 2141 fps, round 2), but
that sweep never split by factor: f=2 wastes 4x VPU work on dilation
zeros, f=4 wastes 16x, while the phase form pays one depth-to-space
regardless.  This probe times each factor/shape separately so the
serving model can pick per-factor.

  python -m tauv_vision_tpu.scripts.upsample_probe [batch]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

# (name, H, W, C, factor) — every DepthwiseUpsample site in the
# production DLASeg at 640x360 (DLAUp internal f=2 ups + IDA f=2/f=4).
SHAPES = (
    ("dla_up_f2_12x20x256", 12, 20, 256, 2),
    ("dla_up_f2_23x40x128", 23, 40, 128, 2),
    ("dla_up_f2_45x80x64", 45, 80, 64, 2),
    ("ida_f2_45x80x64", 45, 80, 64, 2),
    ("ida_f4_23x40x64", 23, 40, 64, 4),
)


def main():
    batch = next((int(a) for a in sys.argv[1:] if a.isdigit()), 128)

    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.models.centerpoint_dla import _bilinear_kernel
    from tauv_vision_tpu.ops.conv_transpose import conv_transpose_phase

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

    rng = np.random.default_rng(0)
    rows = []
    for name, h, w, c, f in SHAPES:
        k = 2 * f
        x = jnp.asarray(rng.normal(size=(batch, h, w, c)).astype(
            np.float32)).astype(jnp.bfloat16)
        kern = jnp.asarray(
            np.broadcast_to(_bilinear_kernel(k)[:, :, None, None],
                            (k, k, 1, c)).astype(np.float32)
        )

        def dilated(x, kern, f=f, k=k):
            pad = k - 1 - f // 2
            flipped = jnp.flip(kern, axis=(0, 1)).astype(x.dtype)
            return jax.lax.conv_general_dilated(
                x, flipped, (1, 1), ((pad, pad), (pad, pad)),
                lhs_dilation=(f, f),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1],
            )

        def phase(x, kern, f=f, k=k):
            return conv_transpose_phase(
                x, kern.astype(x.dtype), stride=f, padding=f // 2,
                output_padding=0, feature_group_count=x.shape[-1],
            )

        ref = np.asarray(dilated(x[:2], kern), np.float32)
        alt = np.asarray(phase(x[:2], kern), np.float32)
        assert ref.shape == alt.shape, (ref.shape, alt.shape)
        err = float(np.abs(ref - alt).max() / (np.abs(ref).max() + 1e-9))

        t_dil = timeit(dilated, x, kern)
        t_ph = timeit(phase, x, kern)
        rows.append({
            "shape": name, "batch": batch,
            "dilated_ms": round(t_dil * 1e3, 3),
            "phase_ms": round(t_ph * 1e3, 3),
            "speedup": round(t_dil / t_ph, 2),
            "rel_err": round(err, 6),
        })
        print(rows[-1], flush=True)
    print(json.dumps({"batch": batch, "rows": rows}))


if __name__ == "__main__":
    main()
