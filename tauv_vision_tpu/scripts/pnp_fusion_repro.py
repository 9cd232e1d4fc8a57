"""Minimal reproduction ladder for the fused YOLO-Pose + in-graph PnP
TPU-worker crash (BENCH.md "YOLO-Pose pipeline"; VERDICT r2 item 5).

Observed in round 2: the fused YOLO-Pose graph (conv backbone ->
belief-prototype einsum -> per-keypoint argmax -> batched LM PnP)
intermittently kills this image's TPU worker, while (a) PnP as its own
jit and (b) the same pipeline without PnP are stable, and (c) the SAME
PnP fused into the CenterNet keypoint pipeline is stable.

Each rung below adds one ingredient; every rung runs in a SUBPROCESS so
a worker crash is recorded instead of killing the harness.  The output
table is the written determination: the first crashing rung isolates
the triggering composition, and rungs that crash with jnp.linalg.solve
replaced by the unrolled Cholesky (ops/pnp.py's solver — no LAPACK
custom call) rule out the solver as the cause.

  python -m tauv_vision_tpu.scripts.pnp_fusion_repro [--repeats 3]

Rungs:
  pnp_alone          solve_pnp_batch jitted by itself
  einsum_pnp         sigmoid(einsum) -> argmax -> PnP in one jit
  decode_pnp         full decode_yolo_pose (no model) with PnP fused
  model_no_pnp       YoloPose forward + decode, PnP disabled
  model_fused_pnp    the full fused serving graph (the crasher)
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

RUNG_SNIPPETS = {
    "pnp_alone": """
import jax, jax.numpy as jnp, numpy as np
from tauv_vision_tpu.ops.pnp import solve_pnp_batch
rng = np.random.default_rng(0)
obj = jnp.asarray(rng.normal(size=(160, 9, 3)).astype(np.float32))
imgp = jnp.asarray(rng.uniform(0, 640, (160, 9, 2)).astype(np.float32))
cam = jnp.asarray([[700., 0, 480.], [0, 700., 240.], [0, 0, 1.]])
mask = jnp.ones((160, 9), bool)
fn = jax.jit(lambda o, i: solve_pnp_batch(o, i, cam, mask, n_iterations=20,
                                          min_points=4))
out = fn(obj, imgp)
print(float(out.translation.sum()))
""",
    "einsum_pnp": """
import jax, jax.numpy as jnp, numpy as np
from tauv_vision_tpu.ops.pnp import solve_pnp_batch
rng = np.random.default_rng(0)
coeff = jnp.asarray(rng.normal(size=(16, 10, 9, 16)).astype(np.float32))
proto = jnp.asarray(rng.normal(size=(16, 120, 240, 16)).astype(np.float32))
cam = jnp.asarray([[700., 0, 480.], [0, 700., 240.], [0, 0, 1.]])
obj = jnp.asarray(rng.normal(size=(9, 3)).astype(np.float32))
@jax.jit
def fn(coeff, proto):
    belief = jax.nn.sigmoid(jnp.einsum(
        "bkqp,bhwp->bkqhw", coeff, proto,
        preferred_element_type=jnp.float32))
    bh, bw = belief.shape[-2:]
    flat = belief.reshape(*belief.shape[:-2], bh * bw)
    idx = jnp.argmax(flat, axis=-1)
    y = (idx // bw).astype(jnp.float32) / bh * 480
    x = (idx % bw).astype(jnp.float32) / bw * 960
    pts = jnp.stack((x, y), axis=-1)
    b, k, n = pts.shape[:3]
    res = solve_pnp_batch(
        jnp.broadcast_to(obj[None, None], (b, k, n, 3)).reshape(b * k, n, 3),
        pts.reshape(b * k, n, 2), cam,
        jnp.max(flat, axis=-1).reshape(b * k, n) > 0.3,
        n_iterations=20, min_points=4)
    return res.translation.sum() + belief.sum()
print(float(fn(coeff, proto)))
""",
    "decode_pnp": """
import jax, jax.numpy as jnp, numpy as np
from tauv_vision_tpu.scripts.pnp_fusion_repro import tiny_config, fake_prediction
from tauv_vision_tpu.serving.yolo_pose_decode import decode_yolo_pose
cfg = tiny_config()
pred = fake_prediction(cfg, batch=16)
cam = jnp.asarray([[700., 0, 480.], [0, 700., 240.], [0, 0, 1.]])
obj = jnp.asarray(np.random.default_rng(0).normal(size=(9, 3)).astype(np.float32))
fn = jax.jit(lambda p: decode_yolo_pose(
    p, cfg, 10, 0.5, 0.5, object_points=obj, camera_matrix=cam))
out = fn(pred)
print(float(out.pose_translation.sum()))
""",
    "model_no_pnp": """
import jax, jax.numpy as jnp, numpy as np
from tauv_vision_tpu.scripts.pnp_fusion_repro import build_pipeline
pipe, frames, variables = build_pipeline(with_pnp=False)
out = pipe(variables, frames)
print(float(sum(l.astype(jnp.float32).sum()
                for l in jax.tree_util.tree_leaves(out))))
""",
    "model_fused_pnp": """
import jax, jax.numpy as jnp, numpy as np
from tauv_vision_tpu.scripts.pnp_fusion_repro import build_pipeline
pipe, frames, variables = build_pipeline(with_pnp=True)
out = pipe(variables, frames)
print(float(sum(l.astype(jnp.float32).sum()
                for l in jax.tree_util.tree_leaves(out))))
""",
}


def tiny_config():
    from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig

    return YoloPoseModelConfig(
        in_w=960, in_h=480, feature_depth=64, n_classes=21,
        n_prototype_masks=16,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        pointnet_layers=((7, 5, 64), (7, 5, 64)),
        pointnet_feature_depth=64,
        prototype_belief_depth=16, prototype_affinity_depth=16,
        belief_depth=9, affinity_depth=18,
        n_prediction_head_layers=1, n_fpn_downsample_layers=2,
        belief_sigma=2.0, affinity_radius=6.0,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5,
        iou_neg_threshold=0.4, negative_example_ratio=3,
    )


def fake_prediction(cfg, batch: int):
    """Random YoloPosePrediction with the serving shapes (no model run)."""
    import jax.numpy as jnp
    import numpy as np

    from tauv_vision_tpu.models.yolo_pose import YoloPosePrediction
    from tauv_vision_tpu.ops.anchors import get_all_anchors

    rng = np.random.default_rng(0)
    anchor = jnp.asarray(get_all_anchors(
        cfg.in_h, cfg.in_w, cfg.n_fpn_levels, cfg.anchor_scales,
        cfg.anchor_aspect_ratios,
    ))
    n = anchor.shape[0]
    bh, bw = cfg.in_h // 8, cfg.in_w // 8

    def r(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    return YoloPosePrediction(
        classification=r(batch, n, cfg.n_classes + 1),
        box_encoding=r(batch, n, 4) * 0.1,
        mask_coeff=r(batch, n, cfg.n_prototype_masks),
        belief_coeff=r(batch, n, cfg.belief_depth,
                       cfg.prototype_belief_depth),
        affinity_coeff=r(batch, n, cfg.affinity_depth,
                         cfg.prototype_affinity_depth),
        anchor=anchor,
        mask_prototype=r(batch, cfg.in_h // 4, cfg.in_w // 4,
                         cfg.n_prototype_masks),
        belief_prototypes=(r(batch, bh, bw, cfg.prototype_belief_depth),
                           r(batch, bh, bw, cfg.prototype_belief_depth)),
        affinity_prototypes=(
            r(batch, bh, bw, cfg.prototype_affinity_depth),
            r(batch, bh, bw, cfg.prototype_affinity_depth),
        ),
    )


def build_pipeline(with_pnp: bool, batch: int = 16):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tauv_vision_tpu.models.yolo_pose import YoloPose
    from tauv_vision_tpu.serving.pipeline import make_yolo_pose_pipeline

    cfg = tiny_config()
    model = YoloPose(cfg, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, cfg.in_h, cfg.in_w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, img0, train=False))(
        jax.random.key(0)
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8)
    )
    object_points = np.array(
        [[0.1 * (i % 3) - 0.1, 0.1 * (i // 3) - 0.1, 0.05 * (i % 2)]
         for i in range(9)], np.float32,
    )
    camera = np.array(
        [[700.0, 0, 480.0], [0, 700.0, 240.0], [0, 0, 1.0]], np.float32
    )
    pipe = make_yolo_pose_pipeline(
        model, cfg, top_k=10, iou_threshold=0.5, confidence_threshold=0.5,
        object_points=object_points if with_pnp else None,
        camera_matrix=camera if with_pnp else None,
        split_pnp=False,
    )
    return pipe, frames, variables


def run_rung(name: str, timeout: int = 900):
    proc = subprocess.run(
        [sys.executable, "-c", RUNG_SNIPPETS[name]],
        capture_output=True, text=True, timeout=timeout,
    )
    ok = proc.returncode == 0
    return {
        "ok": ok,
        "returncode": proc.returncode,
        "tail": (proc.stdout + proc.stderr)[-1500:] if not ok else
        proc.stdout.strip()[-200:],
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=3,
                        help="runs per rung (the crash is intermittent)")
    parser.add_argument("--rungs", nargs="*", default=list(RUNG_SNIPPETS))
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    results = {}
    for name in args.rungs:
        runs = []
        for i in range(args.repeats):
            print(f"rung {name} run {i}...", flush=True)
            r = run_rung(name)
            print(f"  -> {'ok' if r['ok'] else 'CRASH rc=' + str(r['returncode'])}",
                  flush=True)
            runs.append(r)
        results[name] = {
            "crashes": sum(not r["ok"] for r in runs),
            "runs": len(runs),
            "last_fail_tail": next(
                (r["tail"] for r in reversed(runs) if not r["ok"]), None
            ),
        }

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(results, fp, indent=2)
    return results


if __name__ == "__main__":
    main()
