"""Mosaic int8-dot micro-probe: what rate does jax.lax.dot_general
(int8 x int8 -> int32) actually run at inside a Pallas kernel on this
chip, vs the same shape in bf16, vs the XLA int8 conv rate (393 TOP/s
measured)?  Decides whether the transpose kernel's GEMM core is the
bottleneck (kernel probe measured 26 ms vs the 5.5 ms int8 roof).

  python -m tauv_vision_tpu.scripts.mosaic_int8_dot_probe

VERDICT (round 4): UNMEASURABLE on this image — the probe hangs the
server-side compiler (two runs: 400 s and 590 s with reps trimmed
16 -> 4, zero output before the first chained dispatch returned; a
plain 256x256 matmul in a fresh process also stalled behind it), the
same failure class as the round-3 compiler-option sweep's exploratory
arms.  The serving question is settled without it: the Pallas
transpose kernel runs identical math to the XLA phase convs at
26.2 ms vs 9.55 ms (transpose_kernel_probe --decompose), so Mosaic
int8 dots are ~2-3x slower than XLA's int8 conv at K<=1024 on this
chip, and the kernel route is dead regardless of the exact rate.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    M, K, N = 960, 256, 256
    reps_in_kernel = 16

    rows = []
    for in_dtype, acc_dtype, tag in [
        (jnp.int8, jnp.int32, "int8->int32"),
        (jnp.bfloat16, jnp.float32, "bf16->f32"),
    ]:
        a = jnp.asarray(
            rng.integers(-10, 10, size=(M, K)), jnp.float32
        ).astype(in_dtype)
        b = jnp.asarray(
            rng.integers(-10, 10, size=(K, N)), jnp.float32
        ).astype(in_dtype)

        def kernel_fn(ar, br, outr):
            acc = jnp.zeros((M, N), acc_dtype)
            av = ar[:]
            for i in range(reps_in_kernel):
                # rotate a's rows to defeat CSE between reps
                av = jnp.concatenate([av[1:], av[:1]], axis=0)
                acc = acc + jax.lax.dot_general(
                    av, br[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
            outr[:] = acc

        fn = pl.pallas_call(
            kernel_fn,
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        )

        @functools.partial(jax.jit, static_argnums=2)
        def chained(av, bv, n):
            def body(carry, _):
                out = fn(av + carry.astype(av.dtype), bv)
                t = out.astype(jnp.int32).sum()
                return (t % 2).astype(jnp.int32), t

            _, ts = jax.lax.scan(
                body, jnp.zeros((), jnp.int32), None, length=n
            )
            return ts.sum()

        def run(n):
            float(chained(a, b, n))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(a, b, n))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        n_chain = 64
        t = max(run(2 * n_chain) - run(n_chain), 1e-9) / n_chain
        ops = 2 * M * K * N * reps_in_kernel
        rate = ops / t / 1e12
        rows.append({"dtype": tag, "us": round(t * 1e6, 1),
                     "tops": round(rate, 1)})
        print(f"{tag}: {t * 1e6:.1f} us/kernel -> {rate:.1f} TOP/s",
              flush=True)

    print(json.dumps({"m": M, "k": K, "n": N, "rows": rows}))


if __name__ == "__main__":
    main()
