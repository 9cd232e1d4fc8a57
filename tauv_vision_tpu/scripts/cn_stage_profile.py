"""Cumulative stage profile of the bf16 CenterNet serving pipeline.

The north-star configuration (BENCH.md) runs CenterNet on the certified
bf16 float path; it is the fps-limiting side of the fused dual-net
graph (962.5 fps at batch 128 vs the 1000 target).  This script times
truncated pipelines — preprocess | +early trunk | +trees | +DLA-up |
+IDA-up | +heads | +decode — with bench.py's N-vs-2N chained-scan
methodology so the remaining 4%% can be attacked where the time
actually is (the YOLACT int8 side already has such a breakdown in
BENCH.md).

  python -m tauv_vision_tpu.scripts.cn_stage_profile [batch]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BENCH_H, BENCH_W = 480, 640


def main():
    batch = next((int(a) for a in sys.argv[1:] if a.isdigit()), 128)

    import jax
    import jax.numpy as jnp

    import pathlib

    cache = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    from bench import build_centernet

    from tauv_vision_tpu.models.centerpoint_dla import (
        DLA34_CHANNELS,
        DLATrunk,
        DLAUp,
        IDAUpStage,
    )
    from tauv_vision_tpu.ops.image import preprocess
    from tauv_vision_tpu.serving.centernet_decode import decode
    from tauv_vision_tpu.serving.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STDDEV,
    )

    _, variables, model, cfg, _ = build_centernet(deform=False)
    params = variables["params"]["model"]
    stats = variables.get("batch_stats", {}).get("model", {})

    def sub(name):
        v = {"params": params[name]}
        if name in stats:
            v["batch_stats"] = stats[name]
        return v

    trunk = DLATrunk(dtype=jnp.bfloat16)
    channels = list(DLA34_CHANNELS[2:])
    dla_up = DLAUp(channels, deform=False, dtype=jnp.bfloat16)
    up_factors = [2 ** i for i in range(3)]
    ida_up = IDAUpStage(
        channels[0], up_factors, deform=False, dtype=jnp.bfloat16
    )

    def pre(frames):
        return preprocess(
            frames, (cfg.in_h, cfg.in_w), IMAGENET_MEAN, IMAGENET_STDDEV,
            dtype=jnp.bfloat16,
        )

    def levels_of(img):
        return trunk.apply(sub("base"), img, train=False)

    def stage_pre(frames):
        return pre(frames)

    def stage_early(frames):
        # stem + level0 + level1 only: truncate by running the trunk's
        # early convs via a 2-level slice of the full trunk — cheapest
        # honest cut is to run the full trunk and fetch level1, so
        # "early" here = full trunk minus the tree levels, derived by
        # subtraction in the report.
        return levels_of(pre(frames))[1]

    def stage_trunk(frames):
        return levels_of(pre(frames))[-1]

    def sum_all(tree):
        """Scalar summing EVERY output leaf, so no branch is DCE'd.

        Mirrors yl_stage_profile's fix (ADVICE r3): returning only one
        element of a multi-output stage lets XLA dead-code-eliminate the
        siblings.  DLAUp's last output in particular is a passthrough of
        trunk level 5, so `[-1]` used to DCE the entire DLAUp cascade
        and the `+dla_up` row read ~0.
        """
        return sum(
            leaf.astype(jnp.float32).sum()
            for leaf in jax.tree_util.tree_leaves(tree)
        )

    def stage_dla_up(frames):
        levels = levels_of(pre(frames))
        return sum_all(dla_up.apply(sub("dla_up"), levels[2:], train=False))

    def stage_ida_up(frames):
        levels = levels_of(pre(frames))
        y = dla_up.apply(sub("dla_up"), levels[2:], train=False)
        return sum_all(ida_up.apply(sub("ida_up"), list(y[:3]), train=False))

    def stage_heads(frames):
        return sum_all(model.apply(variables, pre_raw(frames), train=False))

    def pre_raw(frames):
        # model.apply includes its own cast; feed it the preprocessed map
        return pre(frames)

    def stage_decode(frames):
        prediction = model.apply(variables, pre(frames), train=False)
        d = decode(prediction, cfg, 10, 0.6)
        return sum_all(d)

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

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 256, (batch, BENCH_H, BENCH_W, 3), dtype=np.uint8
    ))

    stages = (
        ("preprocess", stage_pre),
        ("+early(level1 out)", stage_early),
        ("+trees(level5 out)", stage_trunk),
        ("+dla_up", stage_dla_up),
        ("+ida_up", stage_ida_up),
        ("+heads", stage_heads),
        ("+decode", stage_decode),
    )
    rows = []
    for name, fn in stages:
        t = timeit(fn, frames)
        rows.append({"stage": name, "cum_ms": round(t * 1e3, 2)})
        print(rows[-1], flush=True)
    print(json.dumps({"batch": batch, "rows": rows}))


if __name__ == "__main__":
    main()
