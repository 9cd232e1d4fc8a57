"""Interleaved A/B: combined-pipeline resize with vs without the NCHW
moveaxis round-trip, measured IN CONTEXT on the north-star graph.

``make_combined_pipeline`` inherited ops/image.preprocess's
moveaxis -> resize(NCHW) -> moveaxis shape, but ``resize_bilinear_nhwc``
exists precisely because the two transposes cost more than the resize
on TPU (ops/image.py:31-44, used by the FPN).  The NHWC form is
BIT-IDENTICAL (verified on this chip: max|d| = 0.0 on uint8-range f32
input — jax.image.resize skips scale-1 axes either way), so this is a
pure scheduling/layout question at batch 128 where the [B, 480, 640, 3]
f32 transposes are ~470 MB of HBM round-trip XLA may or may not fuse.

Arms alternate A,B,A,B per round in one process (chip drift cancels —
BENCH.md "Measurement variance").

  python -m tauv_vision_tpu.scripts.preprocess_ab_probe [batch] [rounds]
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
    from bench import build_centernet, build_yolact, load_scales

    from tauv_vision_tpu.ops.image import (
        normalize_image,
        resize_bilinear,
        resize_bilinear_nhwc,
    )
    from tauv_vision_tpu.serving.centernet_decode import decode
    from tauv_vision_tpu.serving.compiler import serving_compiler_options
    from tauv_vision_tpu.serving.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STDDEV,
    )
    from tauv_vision_tpu.serving.quantize import strip_scales
    from tauv_vision_tpu.serving.quantize_chain import yolact_chain_forward
    from tauv_vision_tpu.serving.yolact_decode import decode_yolact

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, BENCH_H, BENCH_W, 3), np.uint8)
    )

    _, cn_vars, cn_model, cn_cfg, _ = build_centernet(deform=False)
    yl_pipe, yl_vars, yl_model, yl_cfg, yl_raw = build_yolact()

    yl_scales = load_scales(
        yl_raw, yl_vars, frames, f"yolact_b{batch}", per_channel=True
    )
    yl_scales = strip_scales(
        yl_scales, ("prediction_head", "protonet/output")
    )
    yl_fwd = yolact_chain_forward(yl_cfg, yl_vars, yl_scales)

    def cn_fwd(img):
        return cn_model.apply(cn_vars, img, train=False)

    out_hw = (cn_cfg.in_h, cn_cfg.in_w)

    def make_pipeline(nhwc: bool):
        def pipeline(img_uint8):
            img = img_uint8.astype(jnp.float32)
            if nhwc:
                img = resize_bilinear_nhwc(img, out_hw)
            else:
                img = jnp.moveaxis(img, -1, -3)
                img = resize_bilinear(img, out_hw)
                img = jnp.moveaxis(img, -3, -1)
            cn_in = normalize_image(img, IMAGENET_MEAN, IMAGENET_STDDEV,
                                    dtype=jnp.bfloat16)
            yl_in = normalize_image(img, yl_cfg.img_mean,
                                    yl_cfg.img_stddev, dtype=jnp.bfloat16)
            cn_dets = decode(cn_fwd(cn_in), cn_cfg, 10, 0.6)
            yl_dets = decode_yolact(yl_fwd(yl_in), yl_cfg, 20, 0.5, 0.5)
            return cn_dets, yl_dets

        return pipeline

    def timeit(pipe, n=6, reps=2):
        @functools.partial(
            jax.jit, static_argnums=1,
            compiler_options=serving_compiler_options(),
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

        t1 = run(n)
        t2 = run(2 * n)
        return max(t2 - t1, 1e-9) / n

    arms = [("moveaxis", make_pipeline(False)),
            ("nhwc", make_pipeline(True))]
    results = {name: [] for name, _ in arms}
    for r in range(rounds):
        for name, pipe in arms:
            t = timeit(pipe)
            fps = batch / t
            results[name].append(fps)
            print(f"round {r} {name}: {t * 1e3:.2f} ms = {fps:.1f} fps",
                  flush=True)
    rows = [
        {"arm": name, "fps_median": round(float(np.median(v)), 1),
         "fps_all": [round(x, 1) for x in v]}
        for name, v in results.items()
    ]
    print(json.dumps({"batch": batch, "rows": rows}))


if __name__ == "__main__":
    main()
