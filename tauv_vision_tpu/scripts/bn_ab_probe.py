"""Interleaved A/B: bf16 BatchNorm outputs vs the f32 flax flow, whole
CenterNet bf16 pipeline (the north-star CN side).

models/centerpoint_dla._bn forces BN to f32 for torch-matching
numerics, so the served bf16 graph materializes an f32 map after EVERY
BN — residual adds, relus, tree roots, and the aggregation joins all
carry f32 activations that the next conv immediately casts back to
bf16.  The early trunk's measured ~30 MB/frame of intermediate HBM
traffic (ROADMAP round-3 analysis) is exactly these maps at twice the
width their consumers read.  ``bn_out=bf16`` keeps the BN arithmetic
in f32 and rounds only the output.

Same discipline as heads_ab_probe: one process, one variables dict
(the knob is parameter-compatible), A,B,A,B rounds under the serving
compiler options.  Decoded-delta certification of the bn16 graph:
quantize_accuracy_check 'flax-bf16-bn16' rung.

  python -m tauv_vision_tpu.scripts.bn_ab_probe [batch] [rounds]
"""

from __future__ import annotations

import dataclasses
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
    from bench import build_centernet

    from tauv_vision_tpu.ops.image import preprocess
    from tauv_vision_tpu.serving.centernet_decode import decode
    from tauv_vision_tpu.serving.compiler import serving_compiler_options
    from tauv_vision_tpu.serving.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STDDEV,
    )

    _, variables, model, cfg, _ = build_centernet(deform=False)

    model_bn16 = dataclasses.replace(
        model, bn_out=jnp.bfloat16, parent=None, name=None
    )

    def make_pipeline(m):
        def pipeline(variables, frames):
            img = preprocess(
                frames, (cfg.in_h, cfg.in_w), IMAGENET_MEAN,
                IMAGENET_STDDEV, dtype=jnp.bfloat16,
            )
            prediction = m.apply(variables, img, train=False)
            return decode(prediction, cfg, 10, 0.6)

        return pipeline

    pipe_a = make_pipeline(model_bn16)
    pipe_b = make_pipeline(model)

    opts = serving_compiler_options()

    def timeit(pipe, frames, n=8, reps=2):
        @functools.partial(
            jax.jit, static_argnums=2, compiler_options=opts
        )
        def chained(variables, frames, n_):
            def body(carry, _):
                out = pipe(variables, frames + carry)
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
            float(chained(variables, frames, n_))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chained(variables, frames, n_))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return max(run(2 * n) - run(n), 1e-9) / n

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 256, (batch, BENCH_H, BENCH_W, 3), dtype=np.uint8
    ))

    da = jax.jit(pipe_a, compiler_options=opts)(variables, frames[:8])
    db = jax.jit(pipe_b, compiler_options=opts)(variables, frames[:8])
    score_delta = float(jnp.abs(da.score - db.score).max())
    print(f"decoded score max delta bn16-vs-f32flow: {score_delta:.2e}",
          flush=True)

    a_times, b_times = [], []
    for r in range(rounds):
        ta = timeit(pipe_a, frames)
        tb = timeit(pipe_b, frames)
        a_times.append(ta)
        b_times.append(tb)
        print({
            "round": r,
            "bn16_ms": round(ta * 1e3, 2),
            "f32flow_ms": round(tb * 1e3, 2),
            "bn16_fps": round(batch / ta, 1),
            "f32flow_fps": round(batch / tb, 1),
        }, flush=True)

    result = {
        "batch": batch,
        "rounds": rounds,
        "score_delta": score_delta,
        "bn16_ms_median": round(float(np.median(a_times)) * 1e3, 2),
        "f32flow_ms_median": round(float(np.median(b_times)) * 1e3, 2),
        "speedup": round(
            float(np.median(b_times)) / float(np.median(a_times)), 4
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
