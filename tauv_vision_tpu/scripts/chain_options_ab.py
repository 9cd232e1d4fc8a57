"""Interleaved A/B: tuned serving compiler options on the CHAIN-INT8
default profile (the driver-recorded headline).

The options winner was tuned on the north-star graph (CN bf16 + YOLACT
parity-int8).  The default bench profile is chain-int8 for BOTH nets —
a different instruction mix (int8 convs + requant epilogues), so the
vmem/LHS verdict does not automatically transfer.  Same discipline as
scripts/xla_flags_probe.py: both arms in ONE process, A,B,...,A,B
rounds, medians — chip drift (±9% single-shot, BENCH.md) cancels.

  python -m tauv_vision_tpu.scripts.chain_options_ab [batch] [rounds]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BENCH_H, BENCH_W = 480, 640


def main() -> None:
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

    from tauv_vision_tpu.serving.compiler import TUNED_TPU_OPTIONS
    from tauv_vision_tpu.serving.quantize_chain import (
        dla34_chain_forward,
        make_centernet_chain_pipeline,
        make_yolact_chain_pipeline,
    )

    _, cn_vars, cn_model, cn_cfg, cn_raw = build_centernet(deform=False)
    _, yl_vars, yl_model, yl_cfg, yl_raw = build_yolact()

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 256, (batch, BENCH_H, BENCH_W, 3), dtype=np.uint8
    ))

    cn_scales = load_scales(cn_raw, cn_vars, frames, f"centernet_b{batch}")
    yl_scales = load_scales(yl_raw, yl_vars, frames, f"yolact_b{batch}")

    # Mirror bench.py's default profile exactly: unjitted chain
    # pipelines timed under the outer chained-scan jit.
    cn_q = make_centernet_chain_pipeline(
        cn_cfg, cn_model.object_config, cn_vars, cn_scales,
        n_detections=10, score_threshold=0.6, jit=False,
    )
    yl_q = make_yolact_chain_pipeline(
        yl_cfg, yl_vars, yl_scales, top_k=20, iou_threshold=0.5,
        confidence_threshold=0.5, jit=False,
    )

    ARMS = {"baseline": None, "tuned": dict(TUNED_TPU_OPTIONS)}
    nets = {"cn": cn_q, "yl": yl_q}

    def make_chained(net_fn, options):
        @functools.partial(
            jax.jit, static_argnums=1, compiler_options=options,
        )
        def chained(frames, n_):
            def body(carry, _):
                out = net_fn(frames + carry)
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

        return chained

    def timeit(chained, n=8, reps=2):
        def run(n_):
            float(chained(frames, n_))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chained(frames, n_))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return max(run(2 * n) - run(n), 1e-9) / n

    fns = {
        (net, arm): make_chained(nets[net], opts)
        for net in nets for arm, opts in ARMS.items()
    }
    results = {k: [] for k in fns}
    for r in range(rounds):
        for key, fn in fns.items():
            t = timeit(fn)
            results[key].append(t)
            print({"round": r, "net_arm": "/".join(key),
                   "ms": round(t * 1e3, 2),
                   "fps": round(batch / t, 1)}, flush=True)

    summary = {}
    for net in nets:
        base = float(np.median(results[(net, "baseline")]))
        for arm in ARMS:
            t = float(np.median(results[(net, arm)]))
            summary[f"{net}/{arm}"] = {
                "fps_median": round(batch / t, 1),
                "ms_all": [round(x * 1e3, 2) for x in results[(net, arm)]],
                "speedup_vs_baseline": round(base / t, 4),
            }
    # combined = harmonic combination, like bench.py's unfused default
    comb = {}
    for arm in ARMS:
        t = sum(
            float(np.median(results[(net, arm)])) for net in nets
        )
        comb[arm] = round(batch / t, 1)
    print(json.dumps({"batch": batch, "rounds": rounds,
                      "arms": summary, "combined_fps": comb}))


if __name__ == "__main__":
    main()
