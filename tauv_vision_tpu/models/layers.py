"""Shared layers with torch-exact semantics.

``TorchConvTranspose`` reproduces ``torch.nn.ConvTranspose2d`` bit-for-bit
(as the true gradient-of-conv): input dilation by ``stride``, edge padding
``(k-1-p, k-1-p+output_padding)``, then a correlation with the spatially
flipped, in/out-swapped kernel.  This matters for importing pretrained
torch checkpoints (DLA-34 / protonet upsamplers); a plain
``flax.linen.ConvTranspose`` is the same function family but a different
parameterization.

Kernel parameter is stored in torch's (kh, kw, out, in) -> here HWOI
converted to HWIO at use; we keep flax's HWIO convention for the stored
parameter so standard initializers apply, and the torch importer
transposes accordingly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchConvTranspose(nn.Module):
    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: NHWC
        in_features = x.shape[-1]
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding

        kernel = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (k, k, in_features, self.features),
            jnp.float32,
        )

        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + op

        # Correlate the dilated input with the spatially flipped kernel.
        flipped = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            flipped,
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(s, s),
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class S2DStemConv(nn.Module):
    """Bias-free stem conv executed in space-to-depth phase form
    (ops/space_to_depth.py): the parameter keeps the original
    [kh, kw, Cin, Cout] HWIO shape — checkpoints and the torch weight
    importers are unaffected — but the conv runs over the f-phase tensor
    so a 3-channel camera stem feeds the MXU f*f*3 input channels.
    Numerically exact (the fold is a linear reindexing of the kernel;
    gradients flow through it, so training works too)."""

    features: int
    kernel_size: int
    stride: int = 1
    f: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from tauv_vision_tpu.ops.space_to_depth import (
            conv_s2d,
            fold_conv_s2d_weights,
        )

        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        folded, pad, po = fold_conv_s2d_weights(
            kernel.astype(self.dtype), self.f, self.stride, k // 2
        )
        return conv_s2d(x.astype(self.dtype), folded, self.f, pad, po)
