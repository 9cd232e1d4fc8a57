"""Interleaved A/B: block-phase vs dilated depthwise upsamples, whole
CenterNet bf16 pipeline.

The CN stage profile (BENCH.md) puts the DLAUp/IDAUp aggregation at
~15 ms of the 55 ms batch-128 budget at ~63% MXU; its five depthwise
upsamples run as dilated correlations that waste f^2 x the tap work on
dilation zeros.  The earlier channel-major phase form fixed that
standalone (37x at f=4) but lost 15% whole-model to the depth-to-space
layout flip; ``up_impl='block'`` (ops/conv_transpose.
depthwise_upsample_block) emits the phases in output-raster axis order
so the interleave is a pure adjacent-axis reshape.

Same discipline as scripts/heads_ab_probe.py: one process, one
variables dict (the switch is parameter-compatible), A,B,A,B rounds so
chip drift cancels.

  python -m tauv_vision_tpu.scripts.upsample_ab_probe [batch] [rounds] \
      [--impl block|pallas]

Round 4 adds ``--impl pallas`` (ops/pallas/depthwise_upsample.py): the
zero-free phase math inside ONE Pallas program with a standard NHWC
write — no XLA depth-to-space at all, so it probes whether the dilated
form's in-context cost is layout interaction rather than the dilation
zeros themselves.
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

    impl = "block"
    if "--impl" in sys.argv:
        impl = sys.argv[sys.argv.index("--impl") + 1]
    model_block = dataclasses.replace(
        model, up_impl=impl, parent=None, name=None
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

    pipe_a = make_pipeline(model_block)  # block-phase upsamples
    pipe_b = make_pipeline(model)        # dilated (current default)

    # Both arms run under the serving compiler options (vmem32m + LHS)
    # — the configuration the north-star graph actually serves with;
    # the Pallas upsample's per-program stack (~30 MB at f=2) also
    # needs the 32 MiB scoped-vmem budget.
    from tauv_vision_tpu.serving.compiler import serving_compiler_options

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

    # numerics guard: near-identical decoded outputs from shared
    # variables (the two lowerings agree to bf16 ulp order)
    da = jax.jit(pipe_a, compiler_options=opts)(variables, frames[:8])
    db = jax.jit(pipe_b, compiler_options=opts)(variables, frames[:8])
    score_delta = float(jnp.abs(da.score - db.score).max())
    print(f"decoded score max delta block-vs-dilated: {score_delta:.2e}",
          flush=True)

    a_times, b_times = [], []
    for r in range(rounds):
        ta = timeit(pipe_a, frames)
        tb = timeit(pipe_b, frames)
        a_times.append(ta)
        b_times.append(tb)
        print({
            "round": r,
            "block_ms": round(ta * 1e3, 2),
            "dilated_ms": round(tb * 1e3, 2),
            "block_fps": round(batch / ta, 1),
            "dilated_fps": round(batch / tb, 1),
        }, flush=True)

    result = {
        "batch": batch,
        "rounds": rounds,
        "impl": impl,
        "score_delta": score_delta,
        "block_ms_median": round(float(np.median(a_times)) * 1e3, 2),
        "dilated_ms_median": round(float(np.median(b_times)) * 1e3, 2),
        "speedup": round(
            float(np.median(b_times)) / float(np.median(a_times)), 4
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
