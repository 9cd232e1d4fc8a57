"""Cumulative stage profile of the chain-int8 YOLACT serving pipeline.

The north-star configuration (BENCH.md) runs YOLACT on the passing
chain-int8 parity rung (backbone+FPN+protonet int8, prediction head +
protonet output bf16) and it is now the fps-limiting side of the fused
dual-net graph (~65 ms vs CenterNet's ~55 at batch 128).  BENCH.md's
coarse breakdown puts the ResNet-18 backbone at ~14.4 ms — ~5x its
combined int8-MXU + HBM floor — so this script times truncated chain
forwards at per-layer-group granularity (stem | maxpool | layer1..4 |
FPN laterals/topdown/preds | protonet pre/up1/mid/up2/post/out | head |
decode) with bench.py's N-vs-2N chained-scan methodology, to locate the
missing milliseconds before optimizing anything.

Reference scope anchor: the YOLACT node forward
(/root/reference/src/tauv_vision/yolact/node/yolact_node.py:119-135).

  python -m tauv_vision_tpu.scripts.yl_stage_profile [batch]
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

BENCH_H, BENCH_W = 480, 640


def main():
    batch = next((int(a) for a in sys.argv[1:] if a.isdigit()), 128)

    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    from bench import build_yolact, load_scales

    import flax.linen as nn

    from tauv_vision_tpu.ops.image import preprocess
    from tauv_vision_tpu.serving.quantize import strip_scales
    from tauv_vision_tpu.serving.quantize_chain import (
        ChainCtx,
        _basic_block,
        fpn_chain,
        prediction_head_chain,
        protonet_chain,
        resnet18_chain,
        yolact_chain_forward,
    )

    _, variables, model, cfg, raw = build_yolact()

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 256, (batch, BENCH_H, BENCH_W, 3), dtype=np.uint8
    ))

    scales = load_scales(raw, variables, frames, f"yolact_b{batch}",
                         per_channel=True)
    # North-star parity tail (bench.py): whole prediction head +
    # protonet output bf16.
    scales = strip_scales(scales, ("prediction_head", "protonet/output"))
    ctx = ChainCtx(variables, scales, dtype=jnp.bfloat16)

    def pre(f):
        return preprocess(
            f, (cfg.in_h, cfg.in_w), cfg.img_mean, cfg.img_stddev,
            dtype=jnp.bfloat16,
        )

    def backbone_until(img, n_layers: int, with_pool: bool = True):
        """resnet18_chain truncated after `n_layers` residual layers."""
        x = ctx.run_layer(
            img, "backbone/conv1", strides=(2, 2), padding=3,
            bn_path="backbone/bn1", act="relu",
        )
        if not with_pool:
            return x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        plan = [(64, 1, False), (128, 2, True), (256, 2, True),
                (512, 2, True)]
        for layer_i, (_, stride, downsample) in enumerate(
            plan[:n_layers], start=1
        ):
            x, _ = _basic_block(
                ctx, x, f"backbone/layer{layer_i}_0", stride, downsample
            )
            x, _ = _basic_block(ctx, x, f"backbone/layer{layer_i}_1", 1,
                                False)
        return x

    def proto_until(fpn0, until: str):
        chain = (
            [f"protonet/pre_{i}"
             for i in range(cfg.n_masknet_layers_pre_upsample)]
            + ["protonet/upsample_1"]
            + [f"protonet/mid_{i}"
               for i in range(cfg.n_masknet_layers_post_upsample)]
            + ["protonet/upsample_2"]
            + [f"protonet/post_{i}"
               for i in range(cfg.n_masknet_layers_post_upsample)]
            + ["protonet/output"]
        )
        stop = next(
            i for i, p in enumerate(chain)
            if p == until or p.endswith("/" + until)
        )
        x = fpn0
        for i, path in enumerate(chain[:stop + 1]):
            next_path = chain[i + 1] if i + 1 < len(chain) else None
            x = ctx.run_layer(
                x, path, transpose="upsample" in path,
                padding=0 if path.endswith("output") else 1,
                act="leaky", next_path=next_path,
            )
        return x

    def fpn_of(img):
        return fpn_chain(ctx, resnet18_chain(ctx, img),
                         cfg.n_fpn_downsample_layers)

    forward = yolact_chain_forward(cfg, variables, scales)

    def sum_all(tree):
        """Scalar summing EVERY output leaf, so no branch is DCE'd.

        Mirrors bench.py's time_chained rule: a stage that returns a
        single field lets XLA dead-code-eliminate every sibling branch
        (e.g. returning .classification drops the whole protonet).
        """
        return sum(
            leaf.astype(jnp.float32).sum()
            for leaf in jax.tree_util.tree_leaves(tree)
        )

    stages = (
        ("preprocess", lambda f: pre(f)),
        ("+stem conv (bf16)",
         lambda f: backbone_until(pre(f), 0, with_pool=False)),
        ("+maxpool", lambda f: nn.max_pool(
            backbone_until(pre(f), 0, with_pool=False), (3, 3),
            strides=(2, 2), padding=((1, 1), (1, 1)))),
        ("+layer1", lambda f: backbone_until(pre(f), 1)),
        ("+layer2", lambda f: backbone_until(pre(f), 2)),
        ("+layer3", lambda f: backbone_until(pre(f), 3)),
        ("+layer4", lambda f: backbone_until(pre(f), 4)),
        ("+fpn", lambda f: sum_all(fpn_of(pre(f)))),
        ("+proto pre", lambda f: proto_until(fpn_of(pre(f))[0], "pre_0")),
        ("+proto up1", lambda f: proto_until(fpn_of(pre(f))[0],
                                             "upsample_1")),
        ("+proto mid", lambda f: proto_until(fpn_of(pre(f))[0], "mid_0")),
        ("+proto up2", lambda f: proto_until(fpn_of(pre(f))[0],
                                             "upsample_2")),
        ("+proto post", lambda f: proto_until(fpn_of(pre(f))[0], "post_0")),
        ("+proto out", lambda f: proto_until(fpn_of(pre(f))[0], "output")),
        ("full fwd (proto+heads)", lambda f: sum_all(forward(pre(f)))),
    )

    def timeit(fn, *args, n=6, reps=2):
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

    rows = []
    for name, fn in stages:
        t = timeit(fn, frames)
        rows.append({"stage": name, "cum_ms": round(t * 1e3, 2)})
        print(rows[-1], flush=True)
    print(json.dumps({"batch": batch, "rows": rows}))


if __name__ == "__main__":
    main()
