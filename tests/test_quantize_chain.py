"""Chain-fused int8 YOLACT (serving/quantize_chain.py) vs the per-layer
int8 path (serving/quantize.py) and the float reference.

The chain forward re-expresses the same quantized math with activations
kept int8 across conv->conv links (BN folded into the requant epilogue),
so it must land close to the per-layer int8 output — the two differ only
in where rounding happens — and within the same distance of the float
path that the per-layer test (tests/test_quantize.py) accepts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.serving.quantize import calibrate, quantized_call


def _small_cfg():
    from tauv_vision_tpu.configs import YolactModelConfig

    return YolactModelConfig(
        in_w=64, in_h=64, feature_depth=16, n_classes=2, n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(12, 24, 48, 96, 192), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5,
        iou_neg_threshold=0.4, negative_example_ratio=3,
    )


@pytest.mark.slow
def test_yolact_chain_matches_per_layer_int8():
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.serving.quantize_chain import yolact_chain_forward

    cfg = _small_cfg()
    model = Yolact(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    apply_fn = lambda b: model.apply(variables, b, train=False)  # noqa: E731

    scales = calibrate(apply_fn, [x])
    per_layer = jax.jit(quantized_call(apply_fn, scales))(x)
    chain = jax.jit(
        yolact_chain_forward(cfg, variables, scales, dtype=jnp.float32)
    )(x)
    ref = apply_fn(x)

    for field in ("classification", "box_encoding", "mask_coeff",
                  "mask_prototype"):
        c = np.asarray(getattr(chain, field))
        p = np.asarray(getattr(per_layer, field))
        r = np.asarray(getattr(ref, field))
        assert c.shape == p.shape == r.shape, field
        assert np.isfinite(c).all(), field
        denom = np.abs(r).max() + 1e-9
        # chain vs per-layer: same math, different rounding points.
        assert np.abs(c - p).max() / denom < 0.2, (
            field, np.abs(c - p).max() / denom
        )
        # chain vs float: the same bar the per-layer path meets.
        assert np.abs(c - r).max() / denom < 0.5, (
            field, np.abs(c - r).max() / denom
        )

    np.testing.assert_allclose(
        np.asarray(chain.anchor), np.asarray(ref.anchor), atol=1e-6
    )


@pytest.mark.slow
def test_yolact_chain_bf16_joins_close_to_exact_flow():
    """join_dtype=bf16 rounds only the ResNet residual joins / taps —
    the outputs must stay within bf16-rounding distance of the exact
    f32-flow chain (the serving-level certification is the parity
    ladder's join16 rung; this guards the mechanism)."""
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.serving.quantize_chain import yolact_chain_forward

    cfg = _small_cfg()
    model = Yolact(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    apply_fn = lambda b: model.apply(variables, b, train=False)  # noqa: E731

    scales = calibrate(apply_fn, [x])
    exact = jax.jit(
        yolact_chain_forward(cfg, variables, scales, dtype=jnp.float32)
    )(x)
    joined = jax.jit(
        yolact_chain_forward(cfg, variables, scales, dtype=jnp.float32,
                             join_dtype=jnp.bfloat16)
    )(x)
    for field in ("classification", "box_encoding", "mask_coeff",
                  "mask_prototype"):
        e = np.asarray(getattr(exact, field))
        j = np.asarray(getattr(joined, field))
        assert np.isfinite(j).all(), field
        denom = np.abs(e).max() + 1e-9
        # The join rounding perturbs int8 quantization codes, and at
        # this tiny random-init scale single code flips dominate — the
        # same regime as the chain-vs-per-layer bar above (0.2).  The
        # production-scale decoded certification is the ladder rung.
        assert np.abs(j - e).max() / denom < 0.2, (
            field, np.abs(j - e).max() / denom
        )


@pytest.mark.slow
def test_dla34_chain_matches_per_layer_int8():
    from math import pi

    from tauv_vision_tpu.configs import (
        AngleConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
    from tauv_vision_tpu.serving.quantize_chain import dla34_chain_forward

    oc = ObjectConfigSet(configs=(
        ObjectConfig(
            id="torpedo",
            yaw=AngleConfig(train=True, modulo=2 * pi),
            pitch=AngleConfig(train=False, modulo=None),
            roll=AngleConfig(train=False, modulo=None),
            train_depth=True, train_keypoints=True,
            keypoints=((0, 0, 0), (0.1, 0, 0)),
        ),
    ))
    model = CenterpointDLA34(object_config=oc, head_conv=32, deform=False)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    apply_fn = lambda b: model.apply(variables, b, train=False)  # noqa: E731

    scales = calibrate(apply_fn, [x])
    assert len(scales) > 30
    per_layer = jax.jit(quantized_call(apply_fn, scales))(x)
    chain = jax.jit(
        dla34_chain_forward(oc, variables, scales, dtype=jnp.float32)
    )(x)
    ref = apply_fn(x)

    for field in ("heatmap", "keypoint_heatmap", "keypoint_affinity",
                  "size", "offset", "yaw_bin", "yaw_offset", "depth"):
        c = np.asarray(getattr(chain, field))
        p = np.asarray(getattr(per_layer, field))
        r = np.asarray(getattr(ref, field))
        assert c.shape == p.shape == r.shape, field
        assert np.isfinite(c).all(), field
        denom = np.abs(r).max() + 1e-9
        assert np.abs(c - p).max() / denom < 0.2, (
            field, np.abs(c - p).max() / denom
        )
        assert np.abs(c - r).max() / denom < 0.5, (
            field, np.abs(c - r).max() / denom
        )


@pytest.mark.slow
def test_yolo_pose_chain_matches_per_layer_int8():
    """Chain-int8 YOLO-Pose forward (quantize_chain.yolo_pose_chain_
    forward) vs the per-layer interceptor and the float reference —
    same bars as the YOLACT chain test above."""
    from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig
    from tauv_vision_tpu.models.yolo_pose import YoloPose
    from tauv_vision_tpu.serving.quantize_chain import yolo_pose_chain_forward

    cfg = YoloPoseModelConfig(
        in_w=64, in_h=64, feature_depth=16, n_classes=2,
        n_prototype_masks=4, belief_depth=3, affinity_depth=6,
        prototype_belief_depth=4, prototype_affinity_depth=4,
        pointnet_layers=((3, 3, 16), (3, 3, 16)),
        pointnet_feature_depth=16, belief_sigma=1.0, affinity_radius=2.0,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_fpn_downsample_layers=2,
        anchor_scales=(12, 24, 48, 96, 192), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5,
        iou_neg_threshold=0.4, negative_example_ratio=3,
        backbone_depth=18,
    )
    model = YoloPose(cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    apply_fn = lambda b: model.apply(variables, b, train=False)  # noqa: E731

    scales = calibrate(apply_fn, [x])
    per_layer = jax.jit(quantized_call(apply_fn, scales))(x)
    chain = jax.jit(
        yolo_pose_chain_forward(cfg, variables, scales, dtype=jnp.float32)
    )(x)
    ref = apply_fn(x)

    fields = ("classification", "box_encoding", "mask_coeff",
              "belief_coeff", "affinity_coeff", "mask_prototype")
    for field in fields:
        c = np.asarray(getattr(chain, field))
        p = np.asarray(getattr(per_layer, field))
        r = np.asarray(getattr(ref, field))
        assert c.shape == p.shape == r.shape, field
        assert np.isfinite(c).all(), field
        denom = np.abs(r).max() + 1e-9
        assert np.abs(c - p).max() / denom < 0.2, (
            field, np.abs(c - p).max() / denom
        )
        assert np.abs(c - r).max() / denom < 0.5, (
            field, np.abs(c - r).max() / denom
        )
    for stage in range(2):
        for which in ("belief_prototypes", "affinity_prototypes"):
            c = np.asarray(getattr(chain, which)[stage])
            p = np.asarray(getattr(per_layer, which)[stage])
            denom = np.abs(p).max() + 1e-9
            assert c.shape == p.shape, which
            assert np.abs(c - p).max() / denom < 0.2, (which, stage)
    np.testing.assert_allclose(
        np.asarray(chain.anchor), np.asarray(ref.anchor), atol=1e-6
    )


@pytest.mark.slow
def test_sequential_calibration_reduces_chain_error():
    """calibrate_sequential fits per-channel (gain, offset) epilogue
    corrections against the float chain with upstream errors included;
    on the calibration distribution the corrected chain must land at
    least as close to float as the uncorrected chain (measured on the
    pre-activation model outputs, where the affine acts)."""
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.serving.quantize_chain import (
        calibrate_sequential,
        yolact_chain_forward,
    )

    cfg = _small_cfg()
    model = Yolact(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    apply_fn = lambda b: model.apply(variables, b, train=False)  # noqa: E731

    scales = calibrate(apply_fn, [x], per_channel=True)

    def build_forward(ctx):
        return yolact_chain_forward(cfg, variables, scales, ctx=ctx)

    gains, corrections = calibrate_sequential(
        build_forward, variables, scales, x, mode="affine",
        dtype=jnp.float32,
    )
    assert set(gains) == set(corrections)
    assert gains  # at least one conv fitted
    for path, g in gains.items():
        assert g.ndim == 1 and np.isfinite(g).all(), path
        assert corrections[path].shape == g.shape, path

    ref = apply_fn(x)
    plain = jax.jit(
        yolact_chain_forward(cfg, variables, scales, dtype=jnp.float32)
    )(x)
    seq = jax.jit(
        yolact_chain_forward(cfg, variables, scales, dtype=jnp.float32,
                             corrections=corrections, gains=gains)
    )(x)

    improved = 0
    for field in ("classification", "box_encoding", "mask_prototype"):
        r = np.asarray(getattr(ref, field), np.float32)
        ep = np.abs(np.asarray(getattr(plain, field), np.float32) - r).mean()
        es = np.abs(np.asarray(getattr(seq, field), np.float32) - r).mean()
        assert np.isfinite(es)
        # allow per-field noise; require no field to regress materially
        assert es <= ep * 1.1, (field, es, ep)
        improved += int(es < ep)
    assert improved >= 1, "sequential fit should tighten some output"


@pytest.mark.slow
def test_sequential_calibration_mean_mode_pins_gain():
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.serving.quantize_chain import (
        calibrate_sequential,
        yolact_chain_forward,
    )

    cfg = _small_cfg()
    model = Yolact(cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(1), x, train=False)
    apply_fn = lambda b: model.apply(variables, b, train=False)  # noqa: E731
    scales = calibrate(apply_fn, [x], per_channel=True)

    gains, corrections = calibrate_sequential(
        lambda ctx: yolact_chain_forward(cfg, variables, scales, ctx=ctx),
        variables, scales, x, mode="mean", dtype=jnp.float32,
    )
    for path, g in gains.items():
        np.testing.assert_array_equal(g, np.ones_like(g)), path
    assert any(np.abs(c).max() > 0 for c in corrections.values())


@pytest.mark.slow
def test_yolact_chain_float_path_bit_exact_bf16():
    """With no calibrated scales the chain IS the float serving path;
    its dtype flow must replicate the flax forward bit-for-bit at bf16
    (BN outputs f32 flowing unrounded, conv+bias outputs bf16, joins
    promoted).  One extra bf16 rounding per boundary costs ~1.6e-3
    decoded score p95 — the whole int8 parity budget — so this guards
    exactness, not closeness."""
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.serving.quantize_chain import yolact_chain_forward

    cfg = _small_cfg()
    model = Yolact(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    ref = model.apply(variables, x, train=False)
    chain = yolact_chain_forward(cfg, variables, {}, dtype=jnp.bfloat16)(x)
    for field in ("classification", "box_encoding", "mask_coeff",
                  "mask_prototype"):
        r = np.asarray(getattr(ref, field), np.float32)
        c = np.asarray(getattr(chain, field), np.float32)
        np.testing.assert_array_equal(r, c, err_msg=field)


@pytest.mark.slow
def test_dla34_chain_dcn_matches_flax():
    """Chain-DCN serving (dla34_chain_forward(deform=True)) vs the flax
    DCN-IDA forward: with no calibrated scales the chain is the float
    serving path, so the bounded-DCN blocks (merged 27-lane offset+mask
    conv -> tanh bound -> sigmoid mask -> shift DCN -> BN -> relu) must
    replicate DeformConvBlock bit-for-bit at bf16.  Guards the round-4
    `bench.py --deform` chain configuration (reference backbone:
    centerpoint_dla.py:360-392).  Uses dcn_impl='shift' (the XLA
    formulation, exact for |offset| <= max_offset like the Pallas
    serving kernel) so the test runs on the CPU suite."""
    from math import pi

    from tauv_vision_tpu.configs import (
        AngleConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
    from tauv_vision_tpu.serving.quantize_chain import dla34_chain_forward

    oc = ObjectConfigSet(configs=(ObjectConfig(
        id="sq", yaw=AngleConfig(train=False, modulo=2 * pi),
        pitch=AngleConfig(train=False, modulo=2 * pi),
        roll=AngleConfig(train=False, modulo=2 * pi),
        train_depth=False, train_keypoints=False, keypoints=None),))
    model = CenterpointDLA34(
        object_config=oc, dtype=jnp.bfloat16, deform=True,
        dcn_impl="shift", dcn_max_offset=1.0, offset_bound=1.0,
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    # The offset/mask convs init to zero (reference recipe) — perturb
    # them so the DCN actually samples off-grid and the test exercises
    # the bounded bilinear path, not the degenerate zero-offset conv.
    def _perturb(tree, key=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k in ("offset", "mask") and isinstance(v, dict) \
                        and "kernel" in v:
                    out[k] = {
                        n: jnp.asarray(
                            rng.normal(size=a.shape).astype(np.float32)
                            * 0.3
                        )
                        for n, a in v.items()
                    }
                else:
                    out[k] = _perturb(v, key + (k,))
            return out
        return tree

    variables = {**variables, "params": _perturb(variables["params"])}

    ref = model.apply(variables, x, train=False)
    chain = dla34_chain_forward(
        oc, variables, {}, dtype=jnp.bfloat16, deform=True,
        dcn_max_offset=1.0, offset_bound=1.0, dcn_impl="shift",
    )(x)
    for field in ("heatmap", "size", "offset"):
        r = np.asarray(getattr(ref, field), np.float32)
        c = np.asarray(getattr(chain, field), np.float32)
        np.testing.assert_array_equal(r, c, err_msg=field)


@pytest.mark.slow
def test_dla34_chain_float_path_bit_exact_bf16():
    from math import pi

    from tauv_vision_tpu.configs import (
        AngleConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
    from tauv_vision_tpu.serving.quantize_chain import dla34_chain_forward

    oc = ObjectConfigSet(configs=(ObjectConfig(
        id="sq", yaw=AngleConfig(train=False, modulo=2 * pi),
        pitch=AngleConfig(train=False, modulo=2 * pi),
        roll=AngleConfig(train=False, modulo=2 * pi),
        train_depth=False, train_keypoints=False, keypoints=None),))
    model = CenterpointDLA34(
        object_config=oc, dtype=jnp.bfloat16, deform=False
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    ref = model.apply(variables, x, train=False)
    chain = dla34_chain_forward(oc, variables, {}, dtype=jnp.bfloat16)(x)
    for field in ("heatmap", "size", "offset"):
        r = np.asarray(getattr(ref, field), np.float32)
        c = np.asarray(getattr(chain, field), np.float32)
        np.testing.assert_array_equal(r, c, err_msg=field)


def test_chain_bf16_join_block_guard_fast():
    """Fast-suite guard for the join_dtype=bf16 mechanism (ADVICE r4):
    join16 is part of the DEFAULT north-star serving path since round
    4, but the full-graph checks above are slow-marked.  One synthetic
    ResNet basic block (the unit every residual join flows through)
    exercises ChainCtx.join in both the downsample-identity and
    pre-residual positions in <1 s."""
    from tauv_vision_tpu.serving.quantize_chain import ChainCtx, _basic_block

    rng = np.random.default_rng(5)

    def conv_p(cin, cout, k):
        return {"kernel": jnp.asarray(
            rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.2
        )}

    def bn_p(c):
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    def bn_s(c):
        return {"mean": jnp.zeros((c,), jnp.float32),
                "var": jnp.ones((c,), jnp.float32)}

    blk = "backbone/layer2_0"
    variables = {
        "params": {"backbone": {"layer2_0": {
            "conv1": conv_p(8, 16, 3), "bn1": bn_p(16),
            "conv2": conv_p(16, 16, 3), "bn2": bn_p(16),
            "downsample_conv": conv_p(8, 16, 1), "downsample_bn": bn_p(16),
        }}},
        "batch_stats": {"backbone": {"layer2_0": {
            "bn1": bn_s(16), "bn2": bn_s(16),
            "downsample_bn": bn_s(16),
        }}},
    }
    scales = {f"{blk}/conv1": 0.05, f"{blk}/conv2": 0.05,
              f"{blk}/downsample_conv": 0.05}
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))

    exact, exact_tap = _basic_block(
        ChainCtx(variables, scales), x, blk, 2, True)
    j16, j16_tap = _basic_block(
        ChainCtx(variables, scales, join_dtype=jnp.bfloat16), x, blk, 2, True)

    # The mechanism must actually round (bf16 taps)...
    assert j16_tap.dtype == jnp.bfloat16
    assert exact_tap.dtype == jnp.float32
    # ...and stay within bf16-rounding distance of the exact flow.
    e = np.asarray(exact, np.float32)
    j = np.asarray(j16, np.float32)
    denom = np.abs(e).max() + 1e-9
    assert np.abs(j - e).max() / denom < 0.02, np.abs(j - e).max() / denom
