"""Stage attribution for the --deform serving pipeline (VERDICT r4
item 3 tail: `--deform` sits at 325.3 fps combined vs the >=400 ask,
and BENCH.md:497-500 charges the gap to "non-kernel DCN stage costs"
without a table).

Times, at the serving batch with the serving compiler options:
  - cumulative pipeline cuts (preprocess | +trunk | +dla_up | +ida_up |
    +heads | +decode) for the DCN-IDA graph (dcn_impl=pallas, r=1,
    the --deform serving configuration), mirroring cn_stage_profile's
    sum-over-all-outputs rule so no branch is DCE'd;
  - the same cuts for the plain-IDA graph in the same process — the
    per-stage DELTA isolates the DCN premium (kernel + offset/mask
    convs + BN) from shared costs;
  - whole-pipeline fps at each requested batch (the 192/256 sweep the
    round-4 lerp verdict queued).

  python -m tauv_vision_tpu.scripts.dcn_stage_profile [batch ...]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BENCH_H, BENCH_W = 480, 640


def main():
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [128]

    import pathlib

    import jax
    import jax.numpy as jnp

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
    from tauv_vision_tpu.serving.compiler import serving_compiler_options
    from tauv_vision_tpu.serving.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STDDEV,
    )

    def build(deform):
        _, variables, model, cfg, _ = build_centernet(
            deform=deform, dcn_impl="pallas", dcn_max_offset=1,
        )
        return variables, model, cfg

    variables_dcn, model_dcn, cfg = build(True)
    variables_plain, model_plain, _ = build(False)

    def sub(variables, name):
        params = variables["params"]["model"]
        stats = variables.get("batch_stats", {}).get("model", {})
        v = {"params": params[name]}
        if name in stats:
            v["batch_stats"] = stats[name]
        return v

    def sum_all(tree):
        return sum(
            leaf.astype(jnp.float32).sum()
            for leaf in jax.tree_util.tree_leaves(tree)
        )

    def make_stages(variables, model, deform):
        trunk = DLATrunk(dtype=jnp.bfloat16)
        channels = list(DLA34_CHANNELS[2:])
        dla_up = DLAUp(
            channels, deform=deform, dcn_impl="pallas", dcn_max_offset=1,
            dtype=jnp.bfloat16,
        )
        ida_up = IDAUpStage(
            channels[0], [2 ** i for i in range(3)], deform=deform,
            dcn_impl="pallas", dcn_max_offset=1, dtype=jnp.bfloat16,
        )

        def pre(frames):
            return preprocess(
                frames, (cfg.in_h, cfg.in_w), IMAGENET_MEAN,
                IMAGENET_STDDEV, dtype=jnp.bfloat16,
            )

        def levels_of(frames):
            return trunk.apply(sub(variables, "base"), pre(frames),
                               train=False)

        return {
            "preprocess": lambda f: pre(f),
            "+trunk": lambda f: levels_of(f)[-1],
            "+dla_up": lambda f: sum_all(dla_up.apply(
                sub(variables, "dla_up"), levels_of(f)[2:], train=False
            )),
            "+ida_up": lambda f: sum_all(ida_up.apply(
                sub(variables, "ida_up"),
                list(dla_up.apply(
                    sub(variables, "dla_up"), levels_of(f)[2:],
                    train=False,
                )[:3]),
                train=False,
            )),
            "+heads+decode": lambda f: sum_all(decode(
                model.apply(variables, pre(f), train=False), cfg, 10, 0.6
            )),
        }

    def timeit(fn, frames, n=6, reps=2):
        @functools.partial(
            jax.jit, static_argnums=1,
            compiler_options=serving_compiler_options(),
        )
        def chained(f, n_):
            def body(carry, _):
                out = fn(f + carry)
                total = sum_all(out) if not hasattr(out, "dtype") \
                    else out.astype(jnp.float32).sum()
                return (total.astype(jnp.int32) % 2).astype(f.dtype), total
            _, totals = jax.lax.scan(
                body, jnp.zeros((), f.dtype), None, length=n_
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

    rng = np.random.default_rng(0)
    results = {}
    for batch in batches:
        frames = jnp.asarray(rng.integers(
            0, 256, (batch, BENCH_H, BENCH_W, 3), dtype=np.uint8
        ))
        rows = []
        stages_dcn = make_stages(variables_dcn, model_dcn, True)
        stages_plain = make_stages(variables_plain, model_plain, False)
        for name in stages_dcn:
            t_dcn = timeit(stages_dcn[name], frames) * 1e3
            t_plain = timeit(stages_plain[name], frames) * 1e3
            rows.append({
                "stage": name,
                "dcn_cum_ms": round(t_dcn, 2),
                "plain_cum_ms": round(t_plain, 2),
                "dcn_premium_ms": round(t_dcn - t_plain, 2),
            })
            print({"batch": batch, **rows[-1]}, flush=True)
        total = rows[-1]
        results[batch] = {
            "rows": rows,
            "cn_dcn_fps": round(batch / (total["dcn_cum_ms"] / 1e3), 1),
            "cn_plain_fps": round(
                batch / (total["plain_cum_ms"] / 1e3), 1
            ),
        }
        print({"batch": batch, "cn_dcn_fps": results[batch]["cn_dcn_fps"],
               "cn_plain_fps": results[batch]["cn_plain_fps"]}, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
