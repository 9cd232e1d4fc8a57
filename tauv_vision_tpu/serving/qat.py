"""Quantization-aware distillation fine-tuning (QAT) for the int8
serving path.

Every pure post-training lever (per-channel scales, asymmetric
activations, MSE clipping, bias correction, sequential affine
recalibration, GPTQ weight rounding) floors the trained DLA-34's
decoded size-delta p95 at ~1.3e-3 — independent of HOW MANY convs are
int8 (scripts/quantize_accuracy_check.py --sweep, BENCH.md).  The
residual is input-dependent quantization noise amplified by the size
regression head, and no static transform of weights or scales removes
it.

This module removes it by optimizing the one thing PTQ holds fixed:
the weights themselves.  ``qat_distill`` fine-tunes a *fake-quantized*
copy of the model (straight-through-estimator rounding at exactly the
serving chain's quantization points) to match the ORIGINAL float
model's head outputs on fresh data:

    minimize  E_x  sum_leaf  w_leaf * MSE(student_int8(x), teacher_bf16(x))

The teacher is frozen at the original weights, so the fine-tuned int8
artifact is trained to reproduce the reference model's outputs — the
decoded-parity objective itself (BASELINE.json: decoded outputs within
1e-3 of the reference).  Task accuracy cannot drift because the
student is anchored to the reference predictions, not to labels.

The fake-quant conv mirrors serving/quantize._quantized_conv
numerically (same per-input-channel activation-scale folding, same
per-output-channel weight scales, same clip grid) but runs in f32 with
STE rounding so gradients flow to the kernels.  Weight scales are
re-derived from the current kernel each forward (exactly like the
chain build does at serving time) and stop-gradiented; activation
scales are fixed (calibrated on the teacher).

Reference anchor: the reference serves its torch models unquantized
(`/root/reference/src/tauv_vision/centernet/node/centernet_node.py`);
int8 serving is a capability this framework adds, and QAT is the
standard technique making it output-faithful.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tauv_vision_tpu.serving.quantize import (
    _conv_path,
    _intercept,
    _should_quantize,
)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """round() with a straight-through gradient (identity)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _fake_quant_conv(module: nn.Conv, x: jnp.ndarray, act_scale,
                     kernel: jnp.ndarray, bias) -> jnp.ndarray:
    """Differentiable mirror of quantize._quantized_conv.

    Same math — per-input-channel activation-scale folding into the
    kernel, per-output-channel symmetric weight scales, [-127, 127]
    grids — but the convolution runs f32 on the dequantized values and
    rounding is straight-through, so ``jax.grad`` reaches ``kernel``
    and ``bias``.  f32 accumulation of int8-grid products differs from
    the serving chain's exact int32 accumulation by < 1e-6 relative —
    three orders below the 1e-3 target.
    """
    kernel = kernel.astype(jnp.float32)
    act_scale = jax.lax.stop_gradient(
        jnp.asarray(act_scale, jnp.float32)
    )
    per_channel = act_scale.ndim >= 1
    if per_channel:
        kernel = kernel * act_scale.reshape(
            (1,) * (kernel.ndim - 2) + (-1, 1)
        )
    w_absmax = jnp.max(
        jnp.abs(kernel.reshape(-1, kernel.shape[-1])), axis=0
    )
    w_scale = jax.lax.stop_gradient(jnp.maximum(w_absmax, 1e-6) / 127.0)
    q_kernel = jnp.clip(ste_round(kernel / w_scale), -127, 127)

    q_x = jnp.clip(
        ste_round(x.astype(jnp.float32) / act_scale), -127, 127
    )

    strides = module.strides or (1, 1)
    if isinstance(strides, int):
        strides = (strides, strides)
    padding = module.padding
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, str):
        pass
    elif isinstance(padding, (list, tuple)) and padding and isinstance(
        padding[0], int
    ):
        padding = tuple((p, p) for p in padding)

    acc = jax.lax.conv_general_dilated(
        q_x,
        q_kernel,
        window_strides=tuple(strides),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=module.feature_group_count,
    )
    out = acc * (w_scale if per_channel else act_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(module.dtype or x.dtype)


def fake_quant_call(
    apply_fn: Callable[[Any], Any],
    scales: Dict[str, Any],
    min_in_channels: int = 16,
):
    """Wrap ``apply_fn(batch)`` so every conv in ``scales`` runs
    fake-quantized (differentiably).  The convs' CURRENT parameters are
    read from the module, so this composes with ``model.apply`` over
    trainable params: gradients flow through the fake-quant grid to the
    kernels via STE."""

    def interceptor(next_fn, args, kwargs, context):
        if (
            context.method_name == "__call__"
            and args
            and isinstance(args[0], jnp.ndarray)
            and isinstance(context.module, nn.Conv)
            and _should_quantize(context.module, args[0], min_in_channels)
        ):
            path = _conv_path(context)
            if path in scales:
                params = context.module.variables["params"]
                return _fake_quant_conv(
                    context.module, args[0], scales[path],
                    params["kernel"],
                    params["bias"] if context.module.use_bias else None,
                )
        return next_fn(*args, **kwargs)

    def wrapped(batch):
        with _intercept(interceptor):
            return apply_fn(batch)

    return wrapped


def _default_leaf_loss(path: Tuple, student: jnp.ndarray,
                       teacher: jnp.ndarray) -> jnp.ndarray:
    """Per-leaf distillation loss.

    Heatmap logits are matched after sigmoid — decode thresholds
    sigmoid scores, so logit error in the saturated tails is
    irrelevant while score error near peaks is exactly what the parity
    metric measures.  Regression maps (size, offset, angles, depth)
    are matched raw.
    """
    name = "/".join(str(getattr(p, "name", p)) for p in path)
    s = student.astype(jnp.float32)
    t = teacher.astype(jnp.float32)
    if "heatmap" in name or "bin" in name:
        s, t = jax.nn.sigmoid(s), jax.nn.sigmoid(t)
    return jnp.mean((s - t) ** 2)


def qat_distill(
    model,
    variables: Dict[str, Any],
    scales: Dict[str, Any],
    batches: Iterable[jnp.ndarray],
    steps: int,
    lr: float = 2e-5,
    leaf_weights: Optional[Dict[str, float]] = None,
    teacher_variables: Optional[Dict[str, Any]] = None,
    log_every: int = 25,
    log_fn: Callable[[str], None] = print,
) -> Dict[str, Any]:
    """Fine-tune ``variables`` so the fake-quantized forward matches the
    frozen teacher's (default: the original ``variables``) float
    forward.  Returns the fine-tuned variables (same structure).

    - BN runs in inference mode (``train=False``) with batch_stats
      frozen — the serving chain folds the same frozen statistics.
    - ALL params train (not just int8 kernels): the bf16 tail layers
      (heads) learn to compensate the trunk's quantization noise, which
      is where the size-head sensitivity lives.
    - ``batches`` yields image batches (same preprocessing domain the
      model serves on); fresh synthetic data each step means there is
      no train/eval split to contaminate.
    """
    teacher_variables = teacher_variables or variables
    params = variables["params"]
    aux = {k: v for k, v in variables.items() if k != "params"}

    tx = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adam(lr)
    )
    opt_state = tx.init(params)

    def student_forward(p, img):
        fq = fake_quant_call(
            lambda b: model.apply({"params": p, **aux}, b, train=False),
            scales,
        )
        return fq(img)

    def teacher_forward(img):
        return model.apply(teacher_variables, img, train=False)

    weights = leaf_weights or {}

    def loss_fn(p, img, teacher_out):
        student_out = student_forward(p, img)
        losses = jax.tree_util.tree_map_with_path(
            _default_leaf_loss, student_out, teacher_out
        )
        total = 0.0
        for path, value in jax.tree_util.tree_flatten_with_path(losses)[0]:
            name = "/".join(str(getattr(q, "name", q)) for q in path)
            w = 1.0
            for key, wv in weights.items():
                if key in name:
                    w = wv
            total = total + w * value
        return total

    @jax.jit
    def step(p, opt_state, img):
        teacher_out = jax.lax.stop_gradient(teacher_forward(img))
        loss, grads = jax.value_and_grad(loss_fn)(p, img, teacher_out)
        updates, opt_state = tx.update(grads, opt_state)
        p = optax.apply_updates(p, updates)
        return p, opt_state, loss

    it = iter(batches)
    for i in range(steps):
        img = next(it)
        params, opt_state, loss = step(params, opt_state, img)
        if log_every and i % log_every == 0:
            log_fn(f"qat step {i}: distill loss {float(loss):.3e}")

    return {"params": params, **aux}
