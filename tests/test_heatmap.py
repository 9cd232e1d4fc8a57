"""Target-generation parity tests: the vectorized jnp renderers must match
a direct numpy restatement of the reference's per-object loops
(centernet/model/loss.py:31-135)."""

from math import floor

import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.ops import heatmap as hm

IN_H, IN_W, RATIO = 64, 96, 4
OUT_H, OUT_W = IN_H // RATIO, IN_W // RATIO


def _loop_heatmap(center, label, valid, n_labels, sigma):
    """Reference loop semantics (loss.py:46-67), restated in numpy."""
    b, n = valid.shape
    out = np.zeros((b, n_labels, OUT_H, OUT_W), np.float32)
    y, x = np.meshgrid(np.arange(OUT_H), np.arange(OUT_W), indexing="ij")
    for bi in range(b):
        for oi in range(n):
            if not valid[bi, oi]:
                continue
            cy = floor(center[bi, oi, 0] * IN_H / RATIO)
            cx = floor(center[bi, oi, 1] * IN_W / RATIO)
            g = np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * sigma**2))
            li = label[bi, oi]
            out[bi, li] = np.maximum(out[bi, li], g)
    return out


def _sample(seed=0, b=3, n=5, n_labels=4):
    rng = np.random.default_rng(seed)
    center = rng.uniform(0.05, 0.95, (b, n, 2)).astype(np.float32)
    label = rng.integers(0, n_labels, (b, n))
    valid = rng.uniform(size=(b, n)) > 0.3
    return center, label, valid


def test_generate_heatmap_parity():
    center, label, valid = _sample()
    ours = np.asarray(
        hm.generate_heatmap(
            jnp.asarray(center), jnp.asarray(label), jnp.asarray(valid),
            n_labels=4, in_h=IN_H, in_w=IN_W, downsample_ratio=RATIO, sigma=2.0,
        )
    )
    theirs = _loop_heatmap(center, label, valid, 4, 2.0)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_generate_heatmap_all_invalid_is_zero():
    center, label, valid = _sample(seed=1)
    valid[:] = False
    out = np.asarray(
        hm.generate_heatmap(
            jnp.asarray(center), jnp.asarray(label), jnp.asarray(valid),
            n_labels=4, in_h=IN_H, in_w=IN_W, downsample_ratio=RATIO, sigma=2.0,
        )
    )
    assert out.max() == 0.0


def test_generate_heatmap_peak_is_one_at_center_cell():
    center = np.asarray([[[0.5, 0.5]]], np.float32)
    label = np.asarray([[2]])
    valid = np.asarray([[True]])
    out = np.asarray(
        hm.generate_heatmap(
            jnp.asarray(center), jnp.asarray(label), jnp.asarray(valid),
            n_labels=3, in_h=IN_H, in_w=IN_W, downsample_ratio=RATIO, sigma=1.5,
        )
    )
    cy, cx = OUT_H // 2, OUT_W // 2
    assert out[0, 2, cy, cx] == 1.0
    assert out[0, 0].max() == 0.0 and out[0, 1].max() == 0.0


def _loop_keypoint_targets(
    kp_center, kp_label, kp_valid, kp_obj_index, obj_center,
    n_keypoints, hm_sigma, aff_sigma,
):
    """Reference loop semantics (loss.py:94-135), restated in numpy."""
    b, k = kp_valid.shape
    heat = np.zeros((b, n_keypoints, OUT_H, OUT_W), np.float32)
    weight = np.zeros((b, n_keypoints, OUT_H, OUT_W), np.float32)
    aff = np.zeros((b, n_keypoints, 2, OUT_H, OUT_W), np.float32)
    dist = np.full((b, n_keypoints, OUT_H, OUT_W), np.inf, np.float32)
    y, x = np.meshgrid(np.arange(OUT_H), np.arange(OUT_W), indexing="ij")
    for bi in range(b):
        for ki in range(k):
            if not kp_valid[bi, ki]:
                continue
            ch = kp_label[bi, ki]
            cy = floor(kp_center[bi, ki, 0] * IN_H / RATIO)
            cx = floor(kp_center[bi, ki, 1] * IN_W / RATIO)
            g = np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * hm_sigma**2))
            heat[bi, ch] = np.maximum(heat[bi, ch], g)
            w = np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * aff_sigma**2))
            weight[bi, ch] = np.maximum(weight[bi, ch], w)

            oc = obj_center[bi, kp_obj_index[bi, ki]]
            disp = np.stack((y / OUT_H, x / OUT_W), 0) - oc[:, None, None]
            d = np.sqrt(disp[0] ** 2 + disp[1] ** 2)
            with np.errstate(divide="ignore", invalid="ignore"):
                unit = np.nan_to_num(disp / d)
            closer = d < dist[bi, ch]
            aff[bi, ch] = np.where(closer[None], unit, aff[bi, ch])
            dist[bi, ch] = np.minimum(dist[bi, ch], d)
    return heat, weight, aff


def test_generate_keypoint_heatmap_parity():
    rng = np.random.default_rng(2)
    b, n, k, n_keypoints = 2, 4, 6, 3
    obj_center = rng.uniform(0.1, 0.9, (b, n, 2)).astype(np.float32)
    kp_center = rng.uniform(0.05, 0.95, (b, k, 2)).astype(np.float32)
    kp_label = rng.integers(0, n_keypoints, (b, k))
    kp_valid = rng.uniform(size=(b, k)) > 0.25
    kp_obj_index = rng.integers(0, n, (b, k))

    ours_h, ours_w, ours_a = hm.generate_keypoint_heatmap(
        jnp.asarray(kp_center), jnp.asarray(kp_label), jnp.asarray(kp_valid),
        jnp.asarray(kp_obj_index), jnp.asarray(obj_center),
        n_keypoints=n_keypoints, in_h=IN_H, in_w=IN_W, downsample_ratio=RATIO,
        heatmap_sigma=2.0, affinity_sigma=3.0,
    )
    ref_h, ref_w, ref_a = _loop_keypoint_targets(
        kp_center, kp_label, kp_valid, kp_obj_index, obj_center,
        n_keypoints, 2.0, 3.0,
    )
    np.testing.assert_allclose(np.asarray(ours_h), ref_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_w), ref_w, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_a), ref_a, atol=1e-4)


def test_out_index_and_gather():
    pos = jnp.asarray([[[0.5, 0.25], [0.999, 0.999]]])
    idx = hm.out_index_for_position(pos, IN_H, IN_W, RATIO)
    assert idx.shape == (1, 2, 2)
    np.testing.assert_array_equal(
        np.asarray(idx[0, 0]), [OUT_H // 2, OUT_W // 4]
    )
    np.testing.assert_array_equal(np.asarray(idx[0, 1]), [OUT_H - 1, OUT_W - 1])

    feat = jnp.arange(OUT_H * OUT_W * 3, dtype=jnp.float32).reshape(
        1, OUT_H, OUT_W, 3
    )
    gathered = hm.gather_at_cells(feat, idx)
    np.testing.assert_array_equal(
        np.asarray(gathered[0, 0]), np.asarray(feat[0, OUT_H // 2, OUT_W // 4])
    )
