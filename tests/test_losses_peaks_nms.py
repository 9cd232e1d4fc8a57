"""Focal loss, peak decode, fast-NMS, mask assembly tests (with torch
parity where the reference formula is nontrivial)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tauv_vision_tpu.ops import losses, masks, nms, peaks
from tauv_vision_tpu.ops.boxes import box_to_mask


def _torch_focal(pred, truth, alpha, beta):
    """Reference focal loss restated (centernet/model/loss.py:302-317)."""
    p = torch.isclose(truth, torch.tensor([1.0]))
    n = p.sum()
    loss_p = ((1 - pred) ** alpha) * torch.log(pred.clamp(min=1e-4)) * p.float()
    loss_n = (
        ((1 - truth) ** beta)
        * (pred**alpha)
        * torch.log((1 - pred).clamp(min=1e-4))
        * (1 - p.float())
    )
    if n == 0:
        return -loss_p
    return -(loss_p + loss_n) / n


def test_focal_loss_parity():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.01, 0.99, (2, 3, 8, 8)).astype(np.float32)
    truth = rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32)
    truth[0, 0, 2, 2] = 1.0
    truth[1, 2, 5, 5] = 1.0

    ours = np.asarray(losses.focal_loss(jnp.asarray(pred), jnp.asarray(truth), 2.0, 4.0))
    theirs = _torch_focal(torch.from_numpy(pred), torch.from_numpy(truth), 2.0, 4.0)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-4)


def test_focal_loss_no_peaks():
    pred = jnp.full((1, 1, 4, 4), 0.3)
    truth = jnp.zeros((1, 1, 4, 4))
    out = np.asarray(losses.focal_loss(pred, truth, 2.0, 4.0))
    # No peaks: negative term dropped, positive term is zero.
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_smooth_l1_parity():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(40,)).astype(np.float32) * 3
    b = rng.normal(size=(40,)).astype(np.float32)
    ours = np.asarray(losses.smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    theirs = F.smooth_l1_loss(
        torch.from_numpy(a), torch.from_numpy(b), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_softmax_ce_parity():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(6, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (6,))
    ours = np.asarray(
        losses.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    )
    theirs = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_heatmap_nms_keeps_peaks():
    """Mirrors the reference self-test (decode.py:717-729): gaussian peaks
    survive NMS at their exact argmax location."""
    from tauv_vision_tpu.ops.heatmap import generate_heatmap

    center = jnp.asarray([[[100 / 512, 100 / 512], [200 / 512, 200 / 512]]])
    label = jnp.asarray([[0, 1]])
    valid = jnp.asarray([[True, True]])
    heat = generate_heatmap(
        center, label, valid, n_labels=2, in_h=512, in_w=512,
        downsample_ratio=1, sigma=50.0,
    )
    suppressed = peaks.heatmap_nms(heat, 3)
    index, lab, score = peaks.heatmap_detect(suppressed, 100)
    assert (int(index[0, 0, 0]), int(index[0, 0, 1])) in ((100, 100), (200, 200))
    top2 = {
        (int(lab[0, i]), int(index[0, i, 0]), int(index[0, i, 1]))
        for i in range(2)
    }
    assert top2 == {(0, 100, 100), (1, 200, 200)}
    assert float(score[0, 0]) == 1.0


def test_heatmap_nms_parity_with_torch_maxpool():
    rng = np.random.default_rng(3)
    heat = rng.uniform(size=(2, 3, 16, 16)).astype(np.float32)
    ours = np.asarray(peaks.heatmap_nms(jnp.asarray(heat), 3))
    t = torch.from_numpy(heat)
    tmax = F.max_pool2d(t, (3, 3), stride=1, padding=1)
    theirs = ((tmax == t).float() * t).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_fast_nms_suppresses_duplicates():
    # Two near-identical boxes + one distant box; high conf on all.
    box = jnp.asarray(
        [[[0.5, 0.5, 0.2, 0.2], [0.505, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1]]]
    )
    cls = jnp.asarray(
        [[[0.0, 5.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.5]]]
    )
    idx, keep = nms.fast_nms(cls, box, top_k=3, iou_threshold=0.5,
                             confidence_threshold=0.05)
    kept = {int(i) for i, k in zip(np.asarray(idx[0]), np.asarray(keep[0])) if k}
    assert kept == {0, 2}


def test_fast_nms_batched():
    rng = np.random.default_rng(4)
    box = rng.uniform(0.2, 0.8, (3, 20, 4)).astype(np.float32)
    cls = rng.normal(size=(3, 20, 4)).astype(np.float32)
    idx, keep = nms.fast_nms(jnp.asarray(cls), jnp.asarray(box), 10, 0.5, 0.3)
    assert idx.shape == (3, 10) and keep.shape == (3, 10)
    # Per-sample result must equal running that sample alone.
    idx0, keep0 = nms.fast_nms(jnp.asarray(cls[:1]), jnp.asarray(box[:1]), 10, 0.5, 0.3)
    np.testing.assert_array_equal(np.asarray(idx[:1]), np.asarray(idx0))
    np.testing.assert_array_equal(np.asarray(keep[:1]), np.asarray(keep0))


def test_assemble_mask_parity_with_loop():
    rng = np.random.default_rng(5)
    proto = rng.normal(size=(8, 12, 16)).astype(np.float32)
    coeff = rng.normal(size=(4, 8)).astype(np.float32)
    box = np.concatenate(
        [
            rng.uniform(0.3, 0.7, (4, 2)).astype(np.float32),
            rng.uniform(0.2, 0.5, (4, 2)).astype(np.float32),
        ],
        axis=-1,
    )

    ours = np.asarray(
        masks.assemble_mask(jnp.asarray(proto), jnp.asarray(coeff), jnp.asarray(box))
    )

    # Loop restatement of masks.py:8-21.
    expected = np.zeros((4, 12, 16), np.float32)
    for i in range(4):
        m = (coeff[i][:, None, None] * proto).sum(0)
        m = 1 / (1 + np.exp(-m))
        m *= np.asarray(box_to_mask(jnp.asarray(box[i]), (12, 16)))
        expected[i] = m
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_assemble_mask_batch():
    rng = np.random.default_rng(6)
    proto = jnp.asarray(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
    coeff = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    out = masks.assemble_mask_batch(proto, coeff)
    assert out.shape == (2, 4, 12, 16)
    single = masks.assemble_mask(proto[1], coeff[1])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-6)


def test_peak_decode_jit():
    logits = jnp.zeros((1, 2, 32, 32)).at[0, 1, 10, 20].set(6.0)
    index, label, score = jax.jit(peaks.peak_decode, static_argnums=1)(logits, 5)
    assert int(label[0, 0]) == 1
    np.testing.assert_array_equal(np.asarray(index[0, 0]), [10, 20])
    assert float(score[0, 0]) > 0.99
