"""On-chip A/B: the Pallas int8 phase-exact transposed conv
(ops/pallas/transpose_conv.py) vs the serving bf16 dilated lowering,
at the protonet upsample shapes (reference masknet.py:45-55).

Both arms measure the FULL chain link the lowering replaces — from the
int8 activation the previous conv emitted to the int8 activation the
next conv consumes:

  chain-bf16    dequant (x.f32 * s_in) -> bf16 dilated transpose + bias
                -> leaky -> _quant(next scale)  [run_layer's exact ops]
  pallas-int8   one kernel: phase GEMMs + fused epilogue

Correctness is asserted ON CHIP first: the kernel must be bit-equal to
the XLA int8-sim reference (lhs-dilated int8 conv + same epilogue) at
the real shape — integer accumulation is associative, so any mismatch
is a kernel bug, not noise.

  python -m tauv_vision_tpu.scripts.transpose_kernel_probe [batch]

Timing: interleaved rounds of the 2N-vs-N chained-dispatch pattern
(bench.py time_chained), medians reported per shape.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.ops.pallas.transpose_conv import (
        phase_tap_matrices,
        transpose_conv2x_int8_pallas,
        transpose_conv2x_int8_phase_xla,
        transpose_conv2x_int8_xla,
    )

    batch = next(
        (int(a) for a in sys.argv[1:] if a.isdigit()), 128
    )
    rng = np.random.default_rng(0)
    shapes = [("up1", 45, 80, 256), ("up2", 90, 160, 256)]
    if "--decompose" in sys.argv:
        shapes = shapes[1:]  # up2 dominates; save the compiles
    out_rows = []

    for name, h, w, c in shapes:
        xq = jnp.asarray(
            rng.integers(-127, 128, size=(batch, h, w, c)), jnp.int8
        )
        kern = np.asarray(
            rng.standard_normal((3, 3, c, c)) * 0.05, np.float32
        )
        s_in = 0.02
        w_scale = np.maximum(
            np.abs(kern.reshape(-1, c)).max(axis=0), 1e-6
        ) / 127.0
        qk = jnp.asarray(
            np.clip(np.round(kern / w_scale), -127, 127), jnp.int8
        )
        deq = jnp.asarray(s_in * w_scale, jnp.float32)
        bias = jnp.asarray(
            rng.standard_normal(c).astype(np.float32) * 0.1
        )
        s_out = jnp.asarray(
            rng.uniform(0.01, 0.05, c).astype(np.float32)
        )
        taps = phase_tap_matrices(qk)
        kern_bf16 = jnp.asarray(kern, jnp.bfloat16)
        flipped = jnp.flip(kern_bf16, axis=(0, 1))

        def chain_bf16(x, flipped=flipped, bias=bias, s_out=s_out):
            xf = (x.astype(jnp.float32) * s_in).astype(jnp.bfloat16)
            y = jax.lax.conv_general_dilated(
                xf, flipped, (1, 1), ((1, 2), (1, 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y + bias.astype(y.dtype)
            y = jax.nn.leaky_relu(y)
            return jnp.clip(
                jnp.round(y.astype(jnp.float32) / s_out), -127, 127
            ).astype(jnp.int8)

        def pallas_int8(x, taps=taps, deq=deq, bias=bias, s_out=s_out):
            return transpose_conv2x_int8_pallas(
                x, taps, deq, bias, s_out
            )

        def phase_xla_int8(x, qk=qk, deq=deq, bias=bias, s_out=s_out):
            return transpose_conv2x_int8_phase_xla(
                x, qk, deq, bias, s_out
            )

        # --- on-chip bit-equality vs the XLA int8-sim reference
        ref = transpose_conv2x_int8_xla(xq[:2], qk, deq, bias, s_out)
        for arm_tag, fn in (
            ("pallas", pallas_int8), ("phase-xla", phase_xla_int8)
        ):
            got = fn(xq[:2])
            eq = bool(jnp.all(ref == got))
            n_bad = int(jnp.sum(ref != got))
            print(f"{name}: {arm_tag} == xla-int8-sim: {eq} "
                  f"(mismatched {n_bad})", flush=True)
            assert eq, f"{name}: {arm_tag} not bit-equal on chip"

        # --- interleaved timing
        def timed(fn, inp, n_chain=8, n_reps=2):
            @functools.partial(jax.jit, static_argnums=1)
            def chained(v, n):
                def body(carry, _):
                    out = fn(
                        jnp.bitwise_xor(v, carry.astype(jnp.int8))
                    )
                    total = out.astype(jnp.int32).sum()
                    return (total % 2).astype(jnp.int32), total

                _, totals = jax.lax.scan(
                    body, jnp.zeros((), jnp.int32), None, length=n
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

        # Decomposition arms (--decompose): where do the phase form's
        # ms go — the small-kernel int8 convs, the epilogue, or the
        # spatial interleave?
        def _phase_convs(x, *, epi_on, ilv, conv_dtype,
                         qk=qk, deq=deq, bias=bias, s_out=s_out):
            k = qk if conv_dtype == jnp.int8 else qk.astype(conv_dtype)
            xin = x if conv_dtype == jnp.int8 else x.astype(conv_dtype)
            acc_t = jnp.int32 if conv_dtype == jnp.int8 else jnp.float32

            def conv(kern, pad):
                return jax.lax.conv_general_dilated(
                    xin, kern, (1, 1), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc_t,
                )

            def epi(acc):
                if not epi_on:
                    # cheapest exact-dtype emission so outputs stay int8
                    return acc.astype(jnp.int8)
                y = acc.astype(jnp.float32) * deq + bias
                y = jnp.where(y >= 0, y, 0.01 * y)
                return jnp.clip(
                    jnp.round(y / s_out), -127, 127
                ).astype(jnp.int8)

            bb, hh, ww, cc = x.shape
            ee = epi(conv(k[1:2, 1:2], ((0, 0), (0, 0))))
            eo = epi(conv(
                jnp.stack([k[1, 2], k[1, 0]], axis=0)[None],
                ((0, 0), (0, 1)),
            ))
            oe = epi(conv(
                jnp.stack([k[2, 1], k[0, 1]], axis=0)[:, None],
                ((0, 1), (0, 0)),
            ))
            oo = epi(conv(
                jnp.stack([
                    jnp.stack([k[2, 2], k[2, 0]], axis=0),
                    jnp.stack([k[0, 2], k[0, 0]], axis=0),
                ], axis=0), ((0, 1), (0, 1)),
            ))
            if not ilv:
                return jnp.concatenate([ee, eo, oe, oo], axis=-1)
            even = jnp.stack([ee, eo], axis=3).reshape(bb, hh, 2 * ww, cc)
            odd = jnp.stack([oe, oo], axis=3).reshape(bb, hh, 2 * ww, cc)
            return jnp.stack([even, odd], axis=2).reshape(
                bb, 2 * hh, 2 * ww, cc
            )

        arms = [
            ("chain-bf16", chain_bf16),
            ("pallas-int8", pallas_int8),
            ("phase-xla-int8", phase_xla_int8),
        ]
        if "--decompose" in sys.argv:
            arms = [
                ("chain-bf16", chain_bf16),
                ("phase-full", functools.partial(
                    _phase_convs, epi_on=True, ilv=True,
                    conv_dtype=jnp.int8)),
                ("phase-noilv", functools.partial(
                    _phase_convs, epi_on=True, ilv=False,
                    conv_dtype=jnp.int8)),
                ("phase-convsonly", functools.partial(
                    _phase_convs, epi_on=False, ilv=False,
                    conv_dtype=jnp.int8)),
                ("phase-bf16convs", functools.partial(
                    _phase_convs, epi_on=False, ilv=False,
                    conv_dtype=jnp.bfloat16)),
            ]
        results = {n: [] for n, _ in arms}
        for r in range(3):
            for arm_name, fn in arms:
                t = timed(fn, xq)
                results[arm_name].append(t * 1e3)
                print(f"{name} round {r} {arm_name}: {t * 1e3:.2f} ms",
                      flush=True)
        for arm_name, ts in results.items():
            out_rows.append({
                "shape": name, "variant": arm_name,
                "ms_median": round(float(np.median(ts)), 2),
                "ms_all": [round(t, 2) for t in ts],
            })

    print(json.dumps({"batch": batch, "rows": out_rows}))


if __name__ == "__main__":
    main()
