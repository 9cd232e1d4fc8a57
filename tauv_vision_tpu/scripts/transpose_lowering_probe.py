"""On-chip A/B of conv-transpose lowerings at the protonet shapes.

The round-4 YOLACT stage profile (BENCH.md) puts proto up2 at 11.8 ms
(batch 128) — exactly the BF16 zero-free roofline, i.e. XLA's dilated
lowering already skips the stride-2 dilation zeros in bf16.  The
remaining headroom is the int8 gap (zero-free int8 roof ~5.5 ms), but
round 3 measured the obvious int8 forms dead: an lhs-dilated int8 conv
is ~1.4x slower than bf16 and the 4-conv zero-free phase decomposition
5x slower, "dominated by the int32 phase concat + depth-to-space pass"
(BENCH.md chain fusion notes).

This probe measures the one untried form: the MERGED phase conv.  For
the protonet's k3 s2 p1 op1 transpose (models/protonet.py:45-55,
reference yolact/model/masknet.py:45-55), every output phase's taps
live inside input offsets {0, 1}^2, so all four phases fuse into ONE
dense stride-1 conv with kernel [2, 2, Cin, 4*Cout] (zeros where a
phase lacks a tap; 16 tap-slots vs 9 real taps = 1.78x structural
waste, but one MXU-shaped conv and NO concat), followed by a single
depth-to-space.  int8 economics: 16/9 x zero-free MACs at 2.05x
int8-vs-bf16 rate => ~0.87x the bf16 zero-free time, PLUS it removes
the chain's bf16 dequant boundary around the transpose.

Variants timed (interleaved in one process, 2N-vs-N methodology like
bench.py):

  dilated-bf16     current serving lowering (quantize_chain run_layer)
  merged-bf16      [2,2,C,4C] conv + depth_to_space, bf16
  merged-int8      int8 x int8 -> int32 merged conv + scale + d2s
  phase4-int8      the round-3 loser, for scale: 4 zero-free int8
                   convs + concat + d2s

  python -m tauv_vision_tpu.scripts.transpose_lowering_probe [batch]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def merged_phase_kernel(kernel_hwio: np.ndarray, stride: int,
                        padding: int) -> tuple[np.ndarray, int]:
    """[k,k,Cin,Cout] transpose kernel -> ([kw,kw,Cin,s*s*Cout] merged
    stride-1 conv kernel, window kw).  Output channels are phase-major
    (a, b, c) so depth_to_space interleaves correctly (matches
    ops/conv_transpose.conv_transpose_phase's concat order)."""
    from tauv_vision_tpu.ops.conv_transpose import _phase_taps

    k = kernel_hwio.shape[0]
    s = stride
    pad_lo = k - 1 - padding
    flipped = kernel_hwio[::-1, ::-1]
    # Collect each phase's taps and input offsets.
    all_d = set()
    taps = {}
    for a in range(s):
        kys, dys = _phase_taps(k, s, pad_lo, a)
        for b in range(s):
            kxs, dxs = _phase_taps(k, s, pad_lo, b)
            taps[(a, b)] = (kys, dys, kxs, dxs)
            all_d.update(dys)
            all_d.update(dxs)
    d_lo, d_hi = min(all_d), max(all_d)
    kw = d_hi - d_lo + 1
    cin, cout = kernel_hwio.shape[2], kernel_hwio.shape[3]
    merged = np.zeros((kw, kw, cin, s * s * cout), kernel_hwio.dtype)
    for (a, b), (kys, dys, kxs, dxs) in taps.items():
        ph = a * s + b
        for ky, dy in zip(kys, dys):
            for kx, dx in zip(kxs, dxs):
                merged[dy - d_lo, dx - d_lo, :,
                       ph * cout:(ph + 1) * cout] = flipped[ky, kx]
    return merged, kw, d_lo


def main():
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.ops.space_to_depth import depth_to_space
    from tauv_vision_tpu.ops.conv_transpose import (
        _phase_taps,
        conv_transpose_phase,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    # proto up2: mid output [B, 90, 160, 256] -> [B, 180, 320, 256]
    h, w, c = 90, 160, 256
    k, s, pad, opad = 3, 2, 1, 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, h, w, c)) * 0.1,
                    jnp.bfloat16)
    kern = np.asarray(rng.standard_normal((k, k, c, c)) * 0.05,
                      np.float32)
    kern_j = jnp.asarray(kern, jnp.bfloat16)

    target_h = (h - 1) * s - 2 * pad + k + opad
    target_w = (w - 1) * s - 2 * pad + k + opad

    def dilated(xx):
        flipped = jnp.flip(kern_j, axis=(0, 1))
        return jax.lax.conv_general_dilated(
            xx, flipped, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    merged_np, kw, d_lo = merged_phase_kernel(kern, s, pad)
    merged_j = jnp.asarray(merged_np, jnp.bfloat16)

    def merged(xx):
        y = jax.lax.conv_general_dilated(
            xx, merged_j, (1, 1),
            ((-d_lo, kw - 1 + d_lo), (-d_lo, kw - 1 + d_lo)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = depth_to_space(y, s)
        return y[:, :target_h, :target_w]

    # int8 merged: quantize input + weights symmetrically.
    sx = float(jnp.max(jnp.abs(x.astype(jnp.float32)))) / 127.0
    xq = jnp.asarray(
        np.clip(np.round(np.asarray(x, np.float32) / sx), -127, 127),
        jnp.int8,
    )
    sw = np.abs(merged_np).max() / 127.0
    merged_q = jnp.asarray(
        np.clip(np.round(merged_np / sw), -127, 127), jnp.int8
    )

    def merged_int8(xq_):
        acc = jax.lax.conv_general_dilated(
            xq_, merged_q, (1, 1),
            ((-d_lo, kw - 1 + d_lo), (-d_lo, kw - 1 + d_lo)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (sx * sw)
        y = depth_to_space(y.astype(jnp.bfloat16), s)
        return y[:, :target_h, :target_w]

    # round-3 loser for scale: 4 zero-free int8 convs + concat + d2s
    flipped_np = kern[::-1, ::-1]
    pad_lo = k - 1 - pad

    def phase4_int8(xq_):
        outs = []
        for a in range(s):
            kys, dys = _phase_taps(k, s, pad_lo, a)
            for b in range(s):
                kxs, dxs = _phase_taps(k, s, pad_lo, b)
                sub = flipped_np[np.ix_(kys, kxs)]
                subq = jnp.asarray(
                    np.clip(np.round(sub / sw), -127, 127), jnp.int8
                )
                acc = jax.lax.conv_general_dilated(
                    xq_, subq, (1, 1),
                    ((-min(dys), max(dys)), (-min(dxs), max(dxs))),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                outs.append(acc)
        y = jnp.concatenate(outs, axis=-1).astype(jnp.float32) * (sx * sw)
        y = depth_to_space(y.astype(jnp.bfloat16), s)
        return y[:, :target_h, :target_w]

    # --- correctness (tiny shapes, f32, vs the reference phase decomp)
    xs = jnp.asarray(rng.standard_normal((2, 5, 6, 4)), jnp.float32)
    ks = np.asarray(rng.standard_normal((k, k, 4, 3)), np.float32)
    ref = conv_transpose_phase(xs, jnp.asarray(ks), s, pad, opad)
    m_np, kw_s, dlo_s = merged_phase_kernel(ks, s, pad)
    got = jax.lax.conv_general_dilated(
        xs, jnp.asarray(m_np), (1, 1),
        ((-dlo_s, kw_s - 1 + dlo_s), (-dlo_s, kw_s - 1 + dlo_s)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = depth_to_space(got, s)[:, : ref.shape[1], : ref.shape[2]]
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 1e-4, f"merged kernel mismatch: {err}"
    print(f"merged-kernel correctness vs conv_transpose_phase: "
          f"max|d|={err:.2e}", flush=True)

    # --- interleaved timing (bench.py time_chained pattern: chain N
    # invocations inside one jit through a data-dependent carry, fetch
    # one scalar, report the 2N-vs-N delta — the relay's ~27 ms fetch
    # cost cancels).
    def timed(fn, inp, n_chain=8, n_reps=2):
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

    arms = [
        ("dilated-bf16", dilated, x),
        ("merged-bf16", merged, x),
        ("merged-int8", merged_int8, xq),
        ("phase4-int8", phase4_int8, xq),
    ]
    rounds = 3
    results = {name: [] for name, _, _ in arms}
    for r in range(rounds):
        for name, fn, inp in arms:
            t = timed(fn, inp)
            results[name].append(t * 1e3)
            print(f"round {r} {name}: {t * 1e3:.2f} ms", flush=True)
    rows = [
        {"variant": name, "ms_median": round(float(np.median(ts)), 2),
         "ms_all": [round(t, 2) for t in ts]}
        for name, ts in results.items()
    ]
    print(json.dumps({"batch": batch, "shape": [h, w, c], "rows": rows}))


if __name__ == "__main__":
    main()
