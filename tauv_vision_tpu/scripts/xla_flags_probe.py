"""XLA compiler-option sweep for the north-star serving graph.

Client-side ``XLA_FLAGS`` cannot carry TPU flags through this image's
relay (the CPU-built client rejects ``--xla_tpu_*`` at flag parse), but
``jax.jit(..., compiler_options=...)`` serializes options into the
compile request per-executable — verified live on the chip.  That also
means the sweep can run as a TRUE interleaved A/B in ONE process
(scripts/heads_ab_probe.py discipline: same variables, same input,
A,B,...,A,B rounds so the ±9% single-shot chip drift documented in
BENCH.md cancels), which process-level XLA_FLAGS rotation never could.

Arms are the documented XLA:TPU serving levers:

- ``xla_tpu_scoped_vmem_limit_kib``: the fusion scratch budget; larger
  values let the fuser keep conv producer/consumer chains in VMEM.
- ``xla_tpu_enable_latency_hiding_scheduler``: reorders HBM prefetches
  against compute (mostly a collectives lever; cheap to test).

Each arm times the full north-star fused pipeline (CN bf16 + YOLACT
parity-chain-int8 + both decodes, shared resize) via the chained-scan
methodology.  Arms whose options the server rejects are reported as
failed rather than aborting the sweep.

  python -m tauv_vision_tpu.scripts.xla_flags_probe [batch] [rounds]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BENCH_H, BENCH_W = 480, 640

_WIN = {
    "xla_tpu_scoped_vmem_limit_kib": "32768",
    "xla_tpu_enable_latency_hiding_scheduler": "true",
}

ARMS: dict[str, dict[str, str]] = {
    # current default-of-record (serving/compiler.py TUNED_TPU_OPTIONS)
    "baseline": dict(_WIN),
    "vmem28m_lhs": {**_WIN, "xla_tpu_scoped_vmem_limit_kib": "28672"},
    "vmem36m_lhs": {**_WIN, "xla_tpu_scoped_vmem_limit_kib": "36864"},
    "vmem40m_lhs": {**_WIN, "xla_tpu_scoped_vmem_limit_kib": "40960"},
}
# A 7-arm variant of this sweep (with exploratory
# xla_tpu_enable_experimental_fusion_cost_model /
# xla_tpu_scavenge_vmem_for_fusions arms) produced NO output in 55
# minutes — one of the exploratory option sets appears to hang or
# drastically slow the server-side compiler.  Keep arms to documented
# options and monitor live.

# Sweep 1 (3 interleaved rounds, this chip): baseline 948.9,
# vmem64m +1.6%, vmem32m +4.1% (tight: 129.6/128.0/129.8 ms),
# lhs +1.6%.  Sweep 2: baseline 963.9, vmem24m +1.45%, vmem32m +1.97%,
# vmem48m +1.77%, vmem32m+lhs +2.66% (989.6 fps) -> TUNED_TPU_OPTIONS.
# The arms above refine around that winner (note the flipped baseline).


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

    from tauv_vision_tpu.serving.pipeline import make_combined_pipeline
    from tauv_vision_tpu.serving.quantize import strip_scales
    from tauv_vision_tpu.serving.quantize_chain import yolact_chain_forward

    # Mirror bench.py --north-star exactly: CN certified bf16 float
    # path, YOLACT parity-chain rung (whole head + proto output bf16).
    _, cn_vars, cn_model, cn_cfg, cn_raw = build_centernet(deform=False)
    _, yl_vars, yl_model, yl_cfg, yl_raw = build_yolact()

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 256, (batch, BENCH_H, BENCH_W, 3), dtype=np.uint8
    ))

    yl_scales = load_scales(
        yl_raw, yl_vars, frames, f"yolact_b{batch}", per_channel=True,
    )
    yl_scales = strip_scales(
        yl_scales, ("prediction_head", "protonet/output")
    )
    cn_fwd = lambda img: cn_model.apply(cn_vars, img, train=False)  # noqa: E731
    yl_fwd = yolact_chain_forward(yl_cfg, yl_vars, yl_scales)
    combined = make_combined_pipeline(
        cn_fwd, cn_cfg, yl_fwd, yl_cfg,
        n_detections=10, score_threshold=0.6, top_k=20,
        iou_threshold=0.5, confidence_threshold=0.5,
    )

    def make_chained(options):
        @functools.partial(
            jax.jit, static_argnums=1,
            compiler_options=options or None,
        )
        def chained(frames, n_):
            def body(carry, _):
                out = combined(frames + carry)
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

    fns: dict[str, object] = {}
    failed: dict[str, str] = {}
    for name, options in ARMS.items():
        fn = make_chained(options)
        try:
            float(fn(frames, 1))  # compile probe
            fns[name] = fn
        except Exception as e:  # noqa: BLE001 — record and move on
            failed[name] = f"{type(e).__name__}: {str(e)[:200]}"
            print({"arm": name, "failed": failed[name]}, flush=True)

    results: dict[str, list[float]] = {k: [] for k in fns}
    for r in range(rounds):
        for name, fn in fns.items():
            t = timeit(fn)
            results[name].append(t)
            print({"round": r, "arm": name, "ms": round(t * 1e3, 2),
                   "fps": round(batch / t, 1)}, flush=True)

    base = float(np.median(results["baseline"]))
    summary = {
        name: {
            "fps_median": round(batch / float(np.median(v)), 1),
            "ms_all": [round(x * 1e3, 2) for x in v],
            "speedup_vs_baseline": round(base / float(np.median(v)), 4),
        }
        for name, v in results.items()
    }
    print(json.dumps({
        "batch": batch, "rounds": rounds, "arms": summary,
        "failed": failed,
    }))


if __name__ == "__main__":
    main()
