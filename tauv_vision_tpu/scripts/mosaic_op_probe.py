"""On-chip cost probe for the Mosaic ops the fused early-trunk kernel
(ops/pallas/early_trunk.py) is built from.

The kernel design (ROADMAP.md "round-4 lever") has one load-bearing
unknown: the MXU cost of short-contraction matmuls.  If Mosaic pads K
to 128, the tap-accumulation form (K = C_in = 16, zero patch build) is
6x waste and im2col (K = 144/147, ~4 VPU copy-cycles per MXU cycle of
patch build) wins; if the bf16 contraction granularity is fine (the
early-pack analysis in BENCH.md concluded it is for XLA convs), tap
accumulation wins outright.  This probe times, inside one Pallas
program on the real chip:

  - dot_general (K,M)x(K,N) contracting the SUBLANE dim, K in
    {16, 32, 48, 144, 160, 256}, M in {16, 32}, N = 640;
  - dot_general [M,K]x[K,N] (K on lhs lanes) for the same shapes;
  - VMEM slice-copy rate (the patch-build primitive): [16, 642] read
    at a dynamic major index / written at a static sublane offset;
  - strided lane slice y[:, ::2] on [32, 640] (the level1 decimation);
  - transpose [32, 320] -> [320, 32] (the NHWC output restore).

Each op runs in a fori_loop whose body consumes an iteration-dependent
input slice and accumulates into a VMEM ref, so nothing is hoisted or
elided; cost = (t(2N) - t(N)) / N like bench.py.

  python -m tauv_vision_tpu.scripts.mosaic_op_probe

MEASURED VERDICT (round 4, real chip) — the fused early-trunk kernel
is RULED OUT; this probe is the record of why:

  - dot[M=16..96, K=144, N=640]: 20 -> 55 TFLOP/s (M=32/N=2560: 70) —
    short-M matmuls are fine, K is NOT padded to 128, so the MXU side
    of the plan holds (~3 ms compute floor for the whole trunk);
  - aligned sublane slice copies: ~1.0-1.4 Tel/s — cheap;
  - UNALIGNED LANE-SHIFT copies (the dx-offset patch reads every
    3x3/7x7 patch build needs): **212-235 Gel/s**, ~5x below the
    aligned rate.  Building the stem's [147, W] patch matrices via
    lane shifts costs ~2.2e9 shifted elements per batch-128 frame set
    ≈ 9 ms on the VPU — ALONE exceeding the ~5 ms the kernel was
    supposed to save (ROADMAP round-4 lever, ceiling +4%);
  - strided lane slice x[:, ::2] and minor-dim reshape decimation
    (the level1 stride-2 path): fail to compile in Mosaic (HTTP 500
    tpu_compile_helper) — the decimation would need transpose_first
    (~365 ns/row, a further tax).

Conclusion: on this VPU the patch-build traffic for 16/32-channel
early convs costs more than the HBM round trips it removes; XLA's
native conv stays the early-trunk lowering (fourth ruled-out
formulation after s2d, im2col, and batch-group packing — BENCH.md).
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N_COLS = 640

    def time_op(make_kernel, iters: int, reps: int = 3):
        """Median seconds per iteration via the 2N-vs-N delta."""

        def run(n):
            f = jax.jit(make_kernel(n))
            float(f())  # compile + warm
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f())
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return max(run(2 * iters) - run(iters), 1e-12) / iters

    # ------------------------------------------------------------------
    # 1) matmul probes
    # ------------------------------------------------------------------
    def matmul_kernel(n_iter, k, m, n_cols, banks=4):
        """Standard [M,K] x [K,N] with `banks` independent accumulators
        so consecutive dots do NOT chain through one accumulator (a
        single-acc loop is MXU-pipeline-DRAIN-bound and measures ~150 ns
        regardless of K — the first version of this probe made exactly
        that mistake and read constant cost for K in 16..256)."""

        def kernel(w_ref, x_ref, out_ref, acc_ref):
            def body(i, _):
                off = (i % 2) * k
                rhs = x_ref[pl.ds(off, k), :]
                d = jax.lax.dot_general(
                    w_ref[:, :], rhs,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                slot = (i % banks) * m
                acc_ref[pl.ds(slot, m), :] += d
                return 0

            acc_ref[:, :] = jnp.zeros_like(acc_ref)
            jax.lax.fori_loop(0, n_iter, body, 0)
            out_ref[:, :] = acc_ref[pl.ds(0, m), :]

        w = jnp.asarray(
            np.random.default_rng(0).standard_normal((m, k)), jnp.bfloat16
        )
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2 * k, n_cols)),
            jnp.bfloat16,
        )

        def call():
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((m, n_cols), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((banks * m, n_cols), jnp.float32)
                ],
            )(w, x)
            return out[0, 0]

        return call

    rows = []
    for (k, m, n_cols, iters) in (
        (16, 16, 640, 150_000),
        (48, 16, 640, 150_000),
        (48, 48, 640, 150_000),
        (144, 16, 640, 150_000),
        (144, 32, 640, 150_000),
        (144, 48, 640, 150_000),
        (144, 96, 640, 100_000),
        (144, 32, 2560, 50_000),
        (48, 48, 2560, 50_000),
        (48, 96, 2560, 50_000),
        (256, 128, 640, 100_000),
    ):
        t = time_op(
            functools.partial(matmul_kernel, k=k, m=m, n_cols=n_cols),
            iters=iters,
        )
        macs = k * m * n_cols
        rows.append({
            "op": f"dot[{m}x{k}xN{n_cols}]",
            "ns": round(t * 1e9, 1),
            "eff_tflops": round(2 * macs / t / 1e12, 1),
        })
        print(rows[-1], flush=True)

    # ------------------------------------------------------------------
    # 2) VMEM slice-copy rate (patch build primitive)
    # ------------------------------------------------------------------
    def copy_kernel(n_iter):
        def kernel(x_ref, out_ref, buf_ref):
            def body(i, _):
                j = i % 16
                # dynamic major read, static sublane-offset write
                buf_ref[pl.ds(3, 16), :] = x_ref[j, :, :]
                buf_ref[pl.ds(21, 16), :] = x_ref[j + 1, :, :]
                buf_ref[pl.ds(40, 16), :] = x_ref[j + 2, :, :]
                return 0

            jax.lax.fori_loop(0, n_iter, body, 0)
            out_ref[:, :] = buf_ref[pl.ds(0, 16), :]

        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((18, 16, 642)),
            jnp.bfloat16,
        )

        def call():
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((16, 642), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((160, 642), jnp.bfloat16)],
            )(x)
            return out[0, 0].astype(jnp.float32)

        return call

    t = time_op(copy_kernel, iters=150_000)
    el = 3 * 16 * 642
    rows.append({"op": "slice_copy 3x[16,642]", "ns": round(t * 1e9, 1),
                 "gel_per_s": round(el / t / 1e9, 1)})
    print(rows[-1], flush=True)

    # ------------------------------------------------------------------
    # 3) unaligned lane-slice copy (dx-shifted reads)
    # ------------------------------------------------------------------
    def shift_kernel(n_iter):
        def kernel(x_ref, out_ref, buf_ref):
            def body(i, _):
                j = i % 16
                buf_ref[pl.ds(0, 16), :] = x_ref[j, :, 1:641]
                buf_ref[pl.ds(16, 16), :] = x_ref[j, :, 2:642]
                return 0

            jax.lax.fori_loop(0, n_iter, body, 0)
            out_ref[:, :] = buf_ref[pl.ds(0, 16), :]

        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((18, 16, 642)),
            jnp.bfloat16,
        )

        def call():
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((16, 640), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((32, 640), jnp.bfloat16)],
            )(x)
            return out[0, 0].astype(jnp.float32)

        return call

    t = time_op(shift_kernel, iters=150_000)
    el = 2 * 16 * 640
    rows.append({"op": "lane-shift copy 2x[16,640]", "ns": round(t * 1e9, 1),
                 "gel_per_s": round(el / t / 1e9, 1)})
    print(rows[-1], flush=True)

    # ------------------------------------------------------------------
    # 4) strided lane slice (level1 decimation) + transpose
    # ------------------------------------------------------------------
    def decim_kernel(n_iter, variant):
        def kernel(x_ref, out_ref, buf_ref):
            def body(i, _):
                j = i % 8
                if variant == "strided":
                    buf_ref[:, :] = x_ref[j, :, ::2]
                elif variant == "reshape_minor":
                    buf_ref[:, :] = x_ref[j].reshape(32, 320, 2)[:, :, 0]
                else:  # transpose_first: [640,32]->[320,2,32]->[:,0,:]
                    t = x_ref[j].T
                    buf_ref[:, :] = t.reshape(320, 2, 32)[:, 0, :].T
                return 0

            jax.lax.fori_loop(0, n_iter, body, 0)
            out_ref[:, :] = buf_ref[:, :]

        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((8, 32, 640)),
            jnp.float32,
        )

        def call():
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((32, 320), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((32, 320), jnp.float32)],
            )(x)
            return out[0, 0]

        return call

    for variant in ("strided", "reshape_minor", "transpose_first"):
        try:
            t = time_op(
                functools.partial(decim_kernel, variant=variant),
                iters=150_000,
            )
            rows.append({"op": f"decimate/{variant} [32,640]->[32,320]",
                         "ns": round(t * 1e9, 1)})
        except Exception as e:  # noqa: BLE001 — probe records unsupported ops
            rows.append({"op": f"decimate/{variant}",
                         "error": str(e)[:160]})
        print(rows[-1], flush=True)

    def transpose_kernel(n_iter):
        def kernel(x_ref, out_ref, buf_ref):
            def body(i, _):
                j = i % 8
                buf_ref[:, :] = x_ref[j].T.astype(jnp.bfloat16)
                return 0

            jax.lax.fori_loop(0, n_iter, body, 0)
            out_ref[:, :] = buf_ref[:, :]

        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((8, 32, 320)),
            jnp.float32,
        )

        def call():
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((320, 32), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((320, 32), jnp.bfloat16)],
            )(x)
            return out[0, 0].astype(jnp.float32)

        return call

    try:
        t = time_op(transpose_kernel, iters=150_000)
        rows.append({"op": "transpose [32,320]->[320,32]+bf16",
                     "ns": round(t * 1e9, 1)})
    except Exception as e:  # noqa: BLE001
        rows.append({"op": "transpose [32,320]->[320,32]+bf16",
                     "error": str(e)[:200]})
    print(rows[-1], flush=True)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
