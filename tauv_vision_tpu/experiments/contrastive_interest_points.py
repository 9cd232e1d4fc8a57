"""Self-supervised contrastive interest-point experiment.

Parity target: ``experiments/contrastive_interest_points/
contrastive_image_points.py`` — a VGG-style encoder predicts a dense
interest heatmap; the same image is warped by N random homographies, the
predicted heatmaps are unwarped, and an equivariance MSE over the
mutually-valid region trains the detector so interest points become
viewpoint-consistent.

jax/flax port: kornia's perspective ops become ops/homography.py, the
VGG19[:24] trunk becomes an equivalent flax conv stack (trained from
scratch, like the reference's ``pretrained=False``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tauv_vision_tpu.ops.homography import get_perspective_transform, warp_perspective
from tauv_vision_tpu.ops.image import resize_bilinear

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STDDEV = (0.229, 0.224, 0.225)


class InterestPointModel(nn.Module):
    """VGG19-features[:24]-equivalent trunk + interest head
    (contrastive_image_points.py:18-50)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # VGG blocks: 2x64 / pool / 2x128 / pool / 4x256 / pool / 3x512.
        plan = [(64, 2), (128, 2), (256, 4), (512, 3)]
        for block_i, (features, count) in enumerate(plan):
            for conv_i in range(count):
                x = nn.Conv(
                    features, (3, 3), padding=1, dtype=self.dtype,
                    name=f"vgg_{block_i}_{conv_i}",
                )(x)
                x = nn.relu(x)
            if block_i < 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="reduce_1")(x))
        x = nn.relu(nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                            name="reduce_2")(x))
        x = nn.Conv(128, (15, 15), padding=7, dtype=self.dtype,
                    name="pre_upscale")(x)

        x = jnp.moveaxis(x, -1, 1)
        x = resize_bilinear(x, (224, 224))
        x = jnp.moveaxis(x, 1, -1)

        x = nn.Conv(1, (15, 15), padding=7, dtype=self.dtype,
                    name="post_upscale")(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))


def random_homography(
    rng: np.random.Generator, size: int = 224, warp_range: int = 5
) -> Tuple[np.ndarray, np.ndarray]:
    """Corner-jitter quad pair (contrastive_image_points.py:93-102)."""
    old = np.array(
        [
            [size // 4, size // 4],
            [3 * size // 4, size // 4],
            [3 * size // 4, 3 * size // 4],
            [size // 4, 3 * size // 4],
        ],
        np.float32,
    )
    new = old + rng.integers(-warp_range, warp_range, old.shape).astype(
        np.float32
    )
    return old, new


@partial(jax.jit, static_argnums=(0, 3))
def equivariance_step(model, params, opt_state, tx_update, img, quads):
    """One training step over n_warps homographies of one image.

    img: [224, 224, 3] in [0, 1]; quads: [n_warps, 2, 4, 2] (old, new).
    """
    n_warps = quads.shape[0]
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STDDEV)

    mats = [
        get_perspective_transform(quads[i, 0], quads[i, 1])
        for i in range(n_warps)
    ]
    inv_mats = [
        get_perspective_transform(quads[i, 1], quads[i, 0])
        for i in range(n_warps)
    ]

    warp_imgs = jnp.concatenate(
        [warp_perspective(img[None], m) for m in mats], axis=0
    )
    mask = jnp.ones((1, 224, 224, 1))
    warp_masks = jnp.concatenate(
        [warp_perspective(mask, m) for m in mats], axis=0
    )

    def loss_fn(params):
        normalized = (warp_imgs - mean) / std
        warp_interest = model.apply({"params": params}, normalized)

        unwarped = jnp.concatenate(
            [
                warp_perspective(warp_interest[i: i + 1], inv_mats[i])
                for i in range(n_warps)
            ],
            axis=0,
        )
        unwarp_masks = jnp.concatenate(
            [
                warp_perspective(warp_masks[i: i + 1], inv_mats[i])
                for i in range(n_warps)
            ],
            axis=0,
        )

        valid = jnp.isclose(unwarp_masks[0], 1.0) & jnp.isclose(
            unwarp_masks[1], 1.0
        )
        mse = (unwarped[0] - unwarped[1]) ** 2
        return jnp.where(valid, mse, 0.0).sum()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx_update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def train_interest_points(
    images: np.ndarray,
    n_epochs: int = 100,
    n_warps: int = 2,
    warp_range: int = 5,
    lr: float = 1e-3,
    seed: int = 0,
):
    """Train the interest-point model on a handful of images
    (contrastive_image_points.py:53-151 main loop)."""
    model = InterestPointModel()
    rng = np.random.default_rng(seed)

    img0 = jnp.asarray(images[0], jnp.float32)
    if img0.max() > 1.5:
        images = [np.asarray(im, np.float32) / 255.0 for im in images]

    params = model.init(jax.random.key(seed), jnp.zeros((1, 224, 224, 3)))[
        "params"
    ]
    tx = optax.sgd(lr, momentum=0.9)
    opt_state = tx.init(params)

    losses = []
    for _ in range(n_epochs):
        for image in images:
            quads = np.stack(
                [
                    np.stack(random_homography(rng, 224, warp_range))
                    for _ in range(n_warps)
                ]
            )
            params, opt_state, loss = equivariance_step(
                model, params, opt_state, tx.update,
                jnp.asarray(image, jnp.float32), jnp.asarray(quads),
            )
            losses.append(float(loss))
    return model, params, losses
