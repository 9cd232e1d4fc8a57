"""Interleaved A/B: fused vs per-head CenterNet head convs.

Single-shot chip measurements this session drifted +-9% run to run
(CN bf16 at batch 128: 2063 / 1986 / 2324 / 1979 fps across identical
or near-identical code), which swamps the ~5-10% effects being tuned.
This probe times the SAME full bf16 CenterNet pipeline with
``fuse_heads`` on vs off — one process, one variables dict (the two
variants are parameter-compatible), alternating A,B,A,B,... rounds —
so chip-state drift cancels and the comparison is honest.

  python -m tauv_vision_tpu.scripts.heads_ab_probe [batch] [rounds]
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
    rounds = ints[1] if len(ints) > 1 else 4

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
    from tauv_vision_tpu.serving.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STDDEV,
    )

    _, variables, model, cfg, _ = build_centernet(deform=False)
    import dataclasses

    model_unfused = dataclasses.replace(model, fuse_heads=False, parent=None,
                                        name=None)

    def make_pipeline(m):
        def pipeline(variables, frames):
            img = preprocess(
                frames, (cfg.in_h, cfg.in_w), IMAGENET_MEAN,
                IMAGENET_STDDEV, dtype=jnp.bfloat16,
            )
            prediction = m.apply(variables, img, train=False)
            return decode(prediction, cfg, 10, 0.6)

        return pipeline

    pipe_a = make_pipeline(model)           # fused (default)
    pipe_b = make_pipeline(model_unfused)   # per-head nn.Conv

    def timeit(pipe, frames, n=8, reps=2):
        @functools.partial(jax.jit, static_argnums=2)
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

    # numerics guard: identical decoded outputs from shared variables
    da = jax.jit(pipe_a)(variables, frames[:8])
    db = jax.jit(pipe_b)(variables, frames[:8])
    score_delta = float(jnp.abs(da.score - db.score).max())
    print(f"decoded score max delta fused-vs-unfused: {score_delta:.2e}",
          flush=True)

    a_times, b_times = [], []
    for r in range(rounds):
        ta = timeit(pipe_a, frames)
        tb = timeit(pipe_b, frames)
        a_times.append(ta)
        b_times.append(tb)
        print({
            "round": r,
            "fused_ms": round(ta * 1e3, 2),
            "unfused_ms": round(tb * 1e3, 2),
            "fused_fps": round(batch / ta, 1),
            "unfused_fps": round(batch / tb, 1),
        }, flush=True)

    result = {
        "batch": batch,
        "rounds": rounds,
        "score_delta": score_delta,
        "fused_ms_median": round(float(np.median(a_times)) * 1e3, 2),
        "unfused_ms_median": round(float(np.median(b_times)) * 1e3, 2),
        "speedup": round(
            float(np.median(b_times)) / float(np.median(a_times)), 4
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
