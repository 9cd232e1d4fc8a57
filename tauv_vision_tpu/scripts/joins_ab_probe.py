"""Interleaved A/B: bf16 joins vs the exact f32 flax flow on the
YOLACT parity chain (the north-star YL side).

The chain mirrors flax's dtype flow for bit-exactness of the float
path: flax BN runs dtype=f32, so the ResNet residual joins, their relu
outputs, and the feature taps all materialize as f32 maps — ~471 MB
per layer1-sized map at batch 128 — even though every consumer
immediately requantizes to int8.  ``ChainCtx(join_dtype=bf16)`` rounds
those joins, halving that HBM traffic.  The stage profile attributes
~3.3 ms of layer1 slack to exactly this class ("64ch underfeeds the
MXU" was the compute-side half; the f32 boundary traffic is the other).

Same discipline as heads_ab_probe: one process, shared variables and
scales, A,B,A,B rounds under the serving compiler options.  Decoded
parity of the join16 rung is certified separately
(yolact_parity_check --rungs pc+outputs+head pc+outputs+head+join16).

  python -m tauv_vision_tpu.scripts.joins_ab_probe [batch] [rounds]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BENCH_H, BENCH_W = 480, 640


def main():
    ints = [int(a) for a in sys.argv[1:] if a.isdigit()]
    batch = ints[0] if ints else 128
    rounds = ints[1] if len(ints) > 1 else 3

    import pathlib

    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    from bench import build_yolact, load_scales

    from tauv_vision_tpu.serving.compiler import serving_compiler_options
    from tauv_vision_tpu.serving.quantize import strip_scales
    from tauv_vision_tpu.serving.quantize_chain import (
        make_yolact_chain_pipeline,
    )

    _, variables, _, cfg, raw = build_yolact()

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 256, (batch, BENCH_H, BENCH_W, 3), dtype=np.uint8
    ))

    # The north-star YL rung: per-channel scales, whole prediction head
    # + protonet output bf16 (bench.py's parity tail).
    scales = load_scales(
        raw, variables, frames, f"yolact_b{batch}", per_channel=True
    )
    scales = strip_scales(scales, ("prediction_head", "protonet/output"))
    print(f"{len(scales)} int8 convs (parity rung)", flush=True)

    def make(join16):
        return make_yolact_chain_pipeline(
            cfg, variables, scales, top_k=20, iou_threshold=0.5,
            confidence_threshold=0.5, jit=False,
            join_dtype=jnp.bfloat16 if join16 else None,
        )

    pipe_a = make(True)
    pipe_b = make(False)

    opts = serving_compiler_options()

    def timeit(pipe, n=8, reps=2):
        @functools.partial(
            jax.jit, static_argnums=1, compiler_options=opts
        )
        def chained(frames, n_):
            def body(carry, _):
                out = pipe(frames + carry)
                total = sum(
                    leaf.astype(jnp.float32).sum()
                    for leaf in jax.tree_util.tree_leaves(out)
                )
                return (
                    (total.astype(jnp.int32) % 2).astype(frames.dtype),
                    total,
                )

            _, totals = jax.lax.scan(
                body, jnp.zeros((), frames.dtype), None, length=n_
            )
            return totals.sum()

        def run(n_):
            float(chained(frames, n_))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chained(frames, n_))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return max(run(2 * n) - run(n), 1e-9) / n

    # decoded-delta spot check (the full rung runs in yolact_parity_check)
    da = jax.jit(pipe_a, compiler_options=opts)(frames[:8])
    db = jax.jit(pipe_b, compiler_options=opts)(frames[:8])
    score_delta = float(jnp.abs(da.score - db.score).max())
    print(f"decoded score max delta join16-vs-exact: {score_delta:.2e}",
          flush=True)

    a_times, b_times = [], []
    for r in range(rounds):
        ta = timeit(pipe_a)
        tb = timeit(pipe_b)
        a_times.append(ta)
        b_times.append(tb)
        print({
            "round": r,
            "join16_ms": round(ta * 1e3, 2),
            "exact_ms": round(tb * 1e3, 2),
            "join16_fps": round(batch / ta, 1),
            "exact_fps": round(batch / tb, 1),
        }, flush=True)

    result = {
        "batch": batch,
        "rounds": rounds,
        "score_delta": score_delta,
        "join16_ms_median": round(float(np.median(a_times)) * 1e3, 2),
        "exact_ms_median": round(float(np.median(b_times)) * 1e3, 2),
        "speedup": round(
            float(np.median(b_times)) / float(np.median(a_times)), 4
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
