"""Microbenchmark: batch-group channel packing for the DLA-34 early trunk.

The 16/32-channel early levels waste the 128-lane MXU on both the
contraction (9*16 = 144 of 256 padded lanes) and the output (16 of 128)
dimension — measured ~8% utilization (scripts/early_conv_probe.py), and
both previously-tried lowerings lose (s2d stems and im2col are
HBM-bound).  This probe measures the remaining formulation: pack G
batch images into the channel dimension ([B,H,W,C] -> [B/G,H,W,G*C])
and expand each kernel to block-diagonal ([kh,kw,G*Cin,G*Cout] with the
original kernel on the diagonal), so one conv computes G images with
full-width MXU tiles.  Cross-image taps multiply by structural zeros —
wasted MACs the padded tiles were already paying for.

Tile arithmetic at G=4 predicts ~1.6x on each early conv (e.g. level0:
contraction 576 -> 5 tiles + output 64 -> 1 tile = 1.25 tiles/img vs 2
unpacked).  The probe times, per early-conv shape, the packed conv vs
the plain conv, then the full early chain (stem -> level0 -> level1
stride-2, with BN-affine + relu between) packed INCLUDING the pack and
unpack transposes vs unpacked — the end-to-end number that decides
whether the model grows an ``early_pack`` option.

  python -m tauv_vision_tpu.scripts.early_pack_probe [batch] [G]

Timing uses bench.py's N-vs-2N chained-scan methodology (see BENCH.md
"Methodology").
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

# (name, H, W, C_in, C_out, kh, stride) — the three early convs of
# DLA-34 at 640x360 (models/centerpoint_dla.py DLATrunk: stem 7x7 3->16,
# level0 3x3 16->16, level1 3x3 16->32 stride 2; DLA34_LEVELS[0:2] = 1).
SHAPES = (
    ("stem", 360, 640, 3, 16, 7, 1),
    ("level0", 360, 640, 16, 16, 3, 1),
    ("level1_down", 360, 640, 16, 32, 3, 2),
)


def block_diag_kernel(k, g):
    """[kh,kw,ci,co] -> [kh,kw,g*ci,g*co] with k on the diagonal."""
    import jax.numpy as jnp

    kh, kw, ci, co = k.shape
    eye = jnp.eye(g, dtype=k.dtype)
    # [kh,kw,ci,co] x [g,g] -> [kh,kw,g,ci,g,co]: block (g,k) is k
    # where g == k, zero elsewhere.
    kp = jnp.einsum("hwio,gk->hwgiko", k, eye)
    return kp.reshape(kh, kw, g * ci, g * co)


def pack(x, g):
    """[B,H,W,C] -> [B/g,H,W,g*C] (image i of a group occupies channel
    block i)."""
    b, h, w, c = x.shape
    return (
        x.reshape(b // g, g, h, w, c)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b // g, h, w, g * c)
    )


def unpack(x, g):
    b, h, w, gc = x.shape
    return (
        x.reshape(b, h, w, g, gc // g)
        .transpose(0, 3, 1, 2, 4)
        .reshape(b * g, h, w, gc // g)
    )


def main():
    ints = [int(a) for a in sys.argv[1:] if a.isdigit()]
    batch = ints[0] if ints else 32
    g = ints[1] if len(ints) > 1 else 4

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

    def conv(x, k, stride=1):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    rng = np.random.default_rng(0)
    rows = []
    kernels = {}
    for name, h, w, cin, cout, kh, stride in SHAPES:
        x = jnp.asarray(rng.normal(size=(batch, h, w, cin)).astype(
            np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(kh, kh, cin, cout)).astype(
            np.float32) * 0.1).astype(jnp.bfloat16)
        kernels[name] = k
        kp = block_diag_kernel(k, g)

        # numerics guard: packed == unpacked (bf16 tolerance)
        ref = np.asarray(conv(x[: 2 * g], k, stride), np.float32)
        alt = np.asarray(
            unpack(conv(pack(x[: 2 * g], g), kp, stride), g), np.float32
        )
        err = float(np.abs(ref - alt).max() / (np.abs(ref).max() + 1e-9))

        xp = pack(x, g)
        t_plain = timeit(lambda x_, k_: conv(x_, k_, stride), x, k)
        t_packed = timeit(lambda x_, k_: conv(x_, k_, stride), xp, kp)
        gflop = 2 * batch * (h // stride) * (w // stride) * kh * kh \
            * cin * cout / 1e9
        rows.append({
            "shape": name, "batch": batch, "g": g,
            "plain_ms": round(t_plain * 1e3, 3),
            "packed_ms": round(t_packed * 1e3, 3),
            "speedup": round(t_plain / t_packed, 2),
            "plain_tflops": round(gflop / t_plain / 1e3, 1),
            "packed_tflops": round(gflop / t_packed / 1e3, 1),
            "rel_err": round(err, 6),
        })
        print(rows[-1], flush=True)

    # End-to-end early chain: stem -> bn-affine+relu -> level0 -> ... ->
    # level1 (stride 2), packed WITH pack/unpack transposes vs plain.
    img = jnp.asarray(rng.normal(size=(batch, 360, 640, 3)).astype(
        np.float32)).astype(jnp.bfloat16)
    affines = {
        name: (
            jnp.asarray(rng.uniform(0.5, 1.5, (cout,)), jnp.bfloat16),
            jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.bfloat16),
        )
        for (name, _, _, _, cout, _, _) in SHAPES
    }

    def chain_plain(img, ks, tile=1):
        x = img
        for name, _, _, _, _, _, stride in SHAPES:
            scale, bias = affines[name]
            if tile > 1:
                scale, bias = jnp.tile(scale, tile), jnp.tile(bias, tile)
            x = conv(x, ks[name], stride)
            x = jax.nn.relu(x * scale + bias)
        return x

    def chain_packed(img, ks):
        return unpack(chain_plain(pack(img, g), ks, tile=g), g)

    kp_all = {n: block_diag_kernel(k, g) for n, k in kernels.items()}
    ref = np.asarray(chain_plain(img[: 2 * g], kernels), np.float32)
    alt = np.asarray(chain_packed(img[: 2 * g], kp_all), np.float32)
    chain_err = float(np.abs(ref - alt).max() / (np.abs(ref).max() + 1e-9))

    t_plain = timeit(lambda i, ks: chain_plain(i, ks), img, kernels)
    t_packed = timeit(lambda i, ks: chain_packed(i, ks), img, kp_all)
    chain_row = {
        "shape": "early_chain(e2e, incl pack/unpack)", "batch": batch,
        "g": g,
        "plain_ms": round(t_plain * 1e3, 3),
        "packed_ms": round(t_packed * 1e3, 3),
        "speedup": round(t_plain / t_packed, 2),
        "saved_us_per_img": round(
            (t_plain - t_packed) / batch * 1e6, 1
        ),
        "rel_err": round(chain_err, 6),
    }
    rows.append(chain_row)
    print(chain_row, flush=True)
    print(json.dumps({"batch": batch, "g": g, "rows": rows}))


if __name__ == "__main__":
    main()
