"""Post-training int8 quantization for the serving path.

The v5e executes int8 convolutions at 2x its bf16 rate (measured: 393
TOP/s vs 192 TFLOP/s on this chip), so quantized serving roughly doubles
detector throughput.  This module quantizes ANY flax model in the zoo
without touching its definition, via ``nn.intercept_methods``:

- **calibration pass**: intercept every ``nn.Conv`` call and record the
  absmax of its input over representative batches -> per-layer activation
  scales;
- **quantized pass**: intercept again, quantize the input per-tensor and
  the kernel per-output-channel to symmetric int8, run the convolution as
  int8 x int8 -> int32 on the MXU, and dequantize (+ bias) in f32.

Symmetric (zero-point 0) quantization keeps zero padding exact.  Layers
are skipped (left in the original dtype) when their contraction is too
small to benefit or too sensitive (e.g. the stem conv from 3 channels),
controlled by ``min_in_channels``.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv_path(context) -> str:
    return "/".join(context.module.path)


def _is_s2d_stem(module) -> bool:
    # Avoid a circular import; match by class name.
    return type(module).__name__ == "S2DStemConv"


def _should_quantize(module, x, min_in_channels: int) -> bool:
    # Transposed convs (TorchConvTranspose) deliberately stay bf16:
    # measured on-chip at the protonet's shapes, int8 never wins there —
    # the lhs-dilated int8 conv is ~1.4x SLOWER than the bf16 one, and
    # the zero-free phase decomposition is 5x slower still (the int32
    # phase concat + depth-to-space materialization dominates).
    if _is_s2d_stem(module):
        # Effective contraction is f*f*C_in — the whole point of the
        # phase stem; always quantizable.
        return x.ndim == 4
    if not isinstance(module, nn.Conv):
        return False
    if x.ndim != 4:
        return False
    return x.shape[-1] >= min_in_channels


@contextlib.contextmanager
def _intercept(fn):
    with nn.intercept_methods(fn):
        yield


def calibrate(
    apply_fn,
    batches: Sequence[Any],
    min_in_channels: int = 16,
    percentile: Optional[float] = None,
    per_channel: bool = False,
):
    """Run ``apply_fn(batch)`` over batches recording per-conv input
    activation ranges.

    Returns {module_path: activation_scale} with
    scale = range / 127, where range is the input absmax (default) or,
    with ``percentile`` set (e.g. 99.9), that percentile of |input| —
    clipping rare outliers trades a little saturation for finer
    resolution on the bulk of the distribution.

    With ``per_channel=True`` the scale is a per-input-channel vector
    (shape [C_in]) instead of a scalar: post-BN-ReLU channel ranges vary
    widely, so a shared scale wastes most of the int8 grid on the
    quiet channels.  The chain-fused path folds the per-channel scales
    into the weights before weight quantization (quantize_chain.py), so
    the int8 conv itself is unchanged.
    """
    import numpy as np

    absmax: Dict[str, Any] = {}

    def recorder(next_fn, args, kwargs, context):
        if (
            context.method_name == "__call__"
            and args
            and isinstance(args[0], jnp.ndarray)
            and _should_quantize(context.module, args[0], min_in_channels)
        ):
            path = _conv_path(context)
            magnitude = jnp.abs(args[0])
            if per_channel:
                flat = magnitude.reshape(-1, magnitude.shape[-1])
                if percentile is None:
                    value = np.asarray(flat.max(axis=0), np.float64)
                else:
                    value = np.asarray(
                        jnp.percentile(flat, percentile, axis=0), np.float64
                    )
                prev = absmax.get(path)
                absmax[path] = (
                    value if prev is None else np.maximum(prev, value)
                )
            else:
                if percentile is None:
                    value = float(magnitude.max())
                else:
                    value = float(jnp.percentile(magnitude, percentile))
                absmax[path] = max(absmax.get(path, 0.0), value)
        return next_fn(*args, **kwargs)

    for batch in batches:
        with _intercept(recorder):
            apply_fn(batch)

    if per_channel:
        return {
            path: np.maximum(v, 1e-6) / 127.0 for path, v in absmax.items()
        }
    return {path: max(v, 1e-6) / 127.0 for path, v in absmax.items()}


def calibrate_range(
    apply_fn,
    batches: Sequence[Any],
    min_in_channels: int = 16,
) -> Dict[str, Any]:
    """Per-input-channel activation (min, max) ranges for ASYMMETRIC
    int8 quantization of the chain.

    Symmetric quantization spends half the int8 grid on negatives, but
    most chain links consume ReLU outputs (min = 0) — asymmetric
    quantization with the zero point folded into a constant per-output
    offset (quantize_chain) doubles the effective resolution there for
    zero runtime cost.  Returns {module_path: (min[C], max[C])} float64
    numpy arrays.
    """
    import numpy as np

    lo: Dict[str, Any] = {}
    hi: Dict[str, Any] = {}

    def recorder(next_fn, args, kwargs, context):
        if (
            context.method_name == "__call__"
            and args
            and isinstance(args[0], jnp.ndarray)
            and _should_quantize(context.module, args[0], min_in_channels)
        ):
            path = _conv_path(context)
            flat = args[0].astype(jnp.float32).reshape(-1, args[0].shape[-1])
            mn = np.asarray(flat.min(axis=0), np.float64)
            mx = np.asarray(flat.max(axis=0), np.float64)
            lo[path] = mn if path not in lo else np.minimum(lo[path], mn)
            hi[path] = mx if path not in hi else np.maximum(hi[path], mx)
        return next_fn(*args, **kwargs)

    for batch in batches:
        with _intercept(recorder):
            apply_fn(batch)

    out = {}
    for path in lo:
        mn = np.minimum(lo[path], 0.0)  # zero must be representable
        mx = np.maximum(hi[path], mn + 1e-6)
        out[path] = (mn, mx)
    return out


def refine_scales_mse(
    apply_fn,
    batches: Sequence[Any],
    scales: Dict[str, Any],
    factors: Sequence[float] = tuple(
        0.5 + 0.05 * i for i in range(11)
    ),
    min_in_channels: int = 16,
) -> Dict[str, Any]:
    """MSE-optimal clipping refinement of per-channel activation scales.

    Absmax scales spend the int8 grid on the single largest value seen;
    when a channel's distribution has a long tail, clipping at a
    fraction of absmax lowers total quantization error (the classic
    clip-vs-resolution tradeoff).  For each calibrated conv input and
    each channel, evaluates candidate scales ``absmax * f`` over the
    calibration batches and keeps the per-channel factor minimizing the
    summed squared quantization error.  Returns a refined copy of
    ``scales`` (same keys/shapes).
    """
    import numpy as np

    factors = np.asarray(list(factors), np.float64)
    errs: Dict[str, Any] = {}

    def recorder(next_fn, args, kwargs, context):
        if (
            context.method_name == "__call__"
            and args
            and isinstance(args[0], jnp.ndarray)
            and _should_quantize(context.module, args[0], min_in_channels)
            and _conv_path(context) in scales
        ):
            path = _conv_path(context)
            x = args[0].astype(jnp.float32).reshape(-1, args[0].shape[-1])
            s = jnp.asarray(scales[path], jnp.float32)  # [C] or scalar
            per_err = []
            for f in factors:
                sf = s * float(f)
                q = jnp.clip(jnp.round(x / sf), -127, 127) * sf
                per_err.append(jnp.sum(jnp.square(x - q), axis=0))
            e = np.asarray(jnp.stack(per_err), np.float64)  # [F, C]
            errs[path] = errs.get(path, 0.0) + e
        return next_fn(*args, **kwargs)

    for batch in batches:
        with _intercept(recorder):
            apply_fn(batch)

    import numpy as np  # noqa: F811

    refined = dict(scales)
    for path, e in errs.items():
        best = factors[np.argmin(e, axis=0)]  # [C]
        s = np.asarray(scales[path], np.float64)
        refined[path] = s * best if s.ndim else float(
            s * factors[int(np.argmin(e.sum(axis=1)))]
        )
    return refined


def calibrate_bias_correction(
    apply_fn,
    batches: Sequence[Any],
    scales: Dict[str, Any],
    min_in_channels: int = 16,
) -> Dict[str, Any]:
    """Per-output-channel bias correction for the int8 chain.

    Weight + activation rounding give each conv a small systematic
    per-channel output offset E[conv_f32(x) - dequant(conv_int8(q(x)))].
    Folding that expectation (estimated over calibration batches, with
    x taken from the float forward) into the conv's epilogue removes the
    bias component of the quantization error; the remaining error is
    zero-mean rounding noise.  Returns {module_path: correction[C_out]}
    to be ADDED to the dequantized accumulator (quantize_chain.run_layer
    applies it before the BN affine, where the error arises).
    """
    import numpy as np

    sums: Dict[str, Any] = {}
    counts: Dict[str, int] = {}

    def recorder(next_fn, args, kwargs, context):
        if (
            context.method_name == "__call__"
            and args
            and isinstance(args[0], jnp.ndarray)
            and _should_quantize(context.module, args[0], min_in_channels)
            and _conv_path(context) in scales
            and isinstance(context.module, nn.Conv)
        ):
            path = _conv_path(context)
            module = context.module
            x = args[0].astype(jnp.float32)
            s_in = jnp.asarray(scales[path], jnp.float32)
            kernel = module.variables["params"]["kernel"].astype(jnp.float32)
            folded = kernel * s_in.reshape(
                (1,) * (kernel.ndim - 2) + (-1, 1)
            ) if s_in.ndim else kernel * s_in
            w_absmax = jnp.max(
                jnp.abs(folded.reshape(-1, folded.shape[-1])), axis=0
            )
            w_scale = jnp.maximum(w_absmax, 1e-6) / 127.0
            qk = jnp.clip(jnp.round(folded / w_scale), -127, 127).astype(
                jnp.int8
            )
            qx = jnp.clip(jnp.round(x / s_in), -127, 127).astype(jnp.int8)

            strides = module.strides or (1, 1)
            if isinstance(strides, int):
                strides = (strides, strides)
            padding = module.padding
            if isinstance(padding, int):
                padding = ((padding, padding), (padding, padding))
            elif isinstance(padding, (list, tuple)) and padding and isinstance(
                padding[0], int
            ):
                padding = tuple((p, p) for p in padding)

            def conv(lhs, rhs, acc_type):
                return jax.lax.conv_general_dilated(
                    lhs, rhs, window_strides=tuple(strides), padding=padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=module.feature_group_count,
                    preferred_element_type=acc_type,
                )

            out_f = conv(x, kernel, jnp.float32)
            out_q = conv(qx, qk, jnp.int32).astype(jnp.float32) * w_scale
            diff = np.asarray(
                jnp.mean(out_f - out_q, axis=(0, 1, 2)), np.float64
            )
            sums[path] = sums.get(path, 0.0) + diff
            counts[path] = counts.get(path, 0) + 1
        return next_fn(*args, **kwargs)

    for batch in batches:
        with _intercept(recorder):
            apply_fn(batch)

    return {path: sums[path] / counts[path] for path in sums}


def strip_scales(scales: Dict[str, Any], substrings) -> Dict[str, Any]:
    """Drop calibration entries whose path contains any substring —
    layers removed here run bf16 in the chain (e.g. the output heads,
    whose convs are a rounding-error fraction of total FLOPs but feed
    the decoded outputs directly)."""
    return {
        p: s for p, s in scales.items()
        if not any(sub in p for sub in substrings)
    }


def _quantized_conv(module: nn.Conv, x: jnp.ndarray, act_scale):
    """int8 x int8 -> int32 convolution with per-output-channel weight
    scales, dequantized to f32 (+ bias).  ``act_scale`` may be a scalar
    or a per-input-channel vector; vectors are folded into the kernel
    before weight quantization (see quantize_chain._wq)."""
    kernel = module.variables["params"]["kernel"].astype(jnp.float32)
    act_scale = jnp.asarray(act_scale, jnp.float32)
    per_channel = act_scale.ndim >= 1
    if per_channel:
        kernel = kernel * act_scale.reshape(
            (1,) * (kernel.ndim - 2) + (-1, 1)
        )
    w_absmax = jnp.max(
        jnp.abs(kernel.reshape(-1, kernel.shape[-1])), axis=0
    )
    w_scale = jnp.maximum(w_absmax, 1e-6) / 127.0
    q_kernel = jnp.clip(
        jnp.round(kernel / w_scale), -127, 127
    ).astype(jnp.int8)

    q_x = jnp.clip(
        jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
    ).astype(jnp.int8)

    strides = module.strides or (1, 1)
    if isinstance(strides, int):
        strides = (strides, strides)
    padding = module.padding
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, str):
        pass  # forwarded as-is
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
        preferred_element_type=jnp.int32,
    )

    out = acc.astype(jnp.float32) * (
        w_scale if per_channel else act_scale * w_scale
    )
    if module.use_bias:
        out = out + module.variables["params"]["bias"].astype(jnp.float32)
    return out.astype(module.dtype or x.dtype)


def _quantized_s2d_stem(module, x: jnp.ndarray, act_scale: float):
    """int8 space-to-depth stem: quantize the phase tensor (same values
    as the image, so the calibrated scale transfers), fold the f32
    kernel, quantize per folded output channel, int8 conv, dequant."""
    from tauv_vision_tpu.ops.space_to_depth import (
        depth_to_space,
        fold_conv_s2d_weights,
        space_to_depth,
    )

    kernel = module.variables["params"]["kernel"].astype(jnp.float32)
    folded, pad, po = fold_conv_s2d_weights(
        kernel, module.f, module.stride, module.kernel_size // 2
    )
    c_out = folded.shape[-1]
    w_absmax = jnp.max(jnp.abs(folded.reshape(-1, c_out)), axis=0)
    w_scale = jnp.maximum(w_absmax, 1e-6) / 127.0
    q_kernel = jnp.clip(jnp.round(folded / w_scale), -127, 127).astype(
        jnp.int8
    )

    xs = space_to_depth(x.astype(jnp.float32), module.f)
    q_x = jnp.clip(jnp.round(xs / act_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        q_x, q_kernel, (1, 1), (tuple(pad), tuple(pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (act_scale * w_scale)
    if po > 1:
        out = depth_to_space(out, po)
    return out.astype(module.dtype or x.dtype)


def quantized_call(
    apply_fn,
    scales: Dict[str, float],
    min_in_channels: int = 16,
):
    """Wrap ``apply_fn(batch)`` so every calibrated conv runs in int8.

    Usage::

        scales = calibrate(lambda b: model.apply(vars, b), cal_batches)
        fn = quantized_call(lambda b: model.apply(vars, b), scales)
        out = jax.jit(fn)(batch)
    """

    def interceptor(next_fn, args, kwargs, context):
        if (
            context.method_name == "__call__"
            and args
            and isinstance(args[0], jnp.ndarray)
            and _should_quantize(context.module, args[0], min_in_channels)
        ):
            path = _conv_path(context)
            if path in scales:
                if _is_s2d_stem(context.module):
                    return _quantized_s2d_stem(
                        context.module, args[0], scales[path]
                    )
                return _quantized_conv(context.module, args[0], scales[path])
        return next_fn(*args, **kwargs)

    def wrapped(batch):
        with _intercept(interceptor):
            return apply_fn(batch)

    return wrapped


def calibrate_gptq(
    apply_fn,
    batches: Sequence[Any],
    scales: Dict[str, Any],
    min_in_channels: int = 16,
    max_rows: int = 8192,
    damp: float = 0.01,
    seed: int = 0,
):
    """Error-compensated int8 weight rounding (GPTQ-style) for the
    chain's calibrated convs.

    Round-to-nearest treats every weight independently; GPTQ quantizes
    the flattened kernel's input dimensions sequentially, propagating
    each dimension's rounding error onto the not-yet-quantized ones
    through the inverse Hessian of the layer's calibration inputs
    (H = X^T X over im2col patches) — the layer OUTPUT error drops
    roughly 2x at the same bit width.  [Frantar et al., 2022 — public
    method, reimplemented from the paper's update equations.]

    Quantization happens in the serving chain's folded space (the
    per-input-channel activation scale folded into the kernel, matching
    quantize_chain._wq), with the per-output-channel weight scale fixed
    to absmax/127 first.  Returns {path: (qk int8 [kh,kw,C,O],
    w_scale [O])} to pass as ``ChainCtx(wq_override=...)``.

    ``scales`` maps path -> per-input-channel activation scale (sym) or
    (min, max) range tuple (asym) — only its keys and the fold vector
    matter here.
    """
    import numpy as np

    inputs: Dict[str, list] = {}
    kernels: Dict[str, Any] = {}
    rng = np.random.default_rng(seed)

    def recorder(next_fn, args, kwargs, context):
        if (
            context.method_name == "__call__"
            and args
            and isinstance(args[0], jnp.ndarray)
            and _should_quantize(context.module, args[0], min_in_channels)
            and _conv_path(context) in scales
            and isinstance(context.module, nn.Conv)
        ):
            path = _conv_path(context)
            module = context.module
            if path not in kernels:
                kernels[path] = (
                    np.asarray(
                        module.variables["params"]["kernel"], np.float64
                    ),
                    module.strides or (1, 1),
                    module.padding,
                )
            x = np.asarray(args[0], np.float64)
            inputs.setdefault(path, []).append(x)
        return next_fn(*args, **kwargs)

    for batch in batches:
        with _intercept(recorder):
            apply_fn(batch)

    out = {}
    for path, (kernel, strides, padding) in kernels.items():
        kh, kw, c, o = kernel.shape
        if isinstance(strides, int):
            strides = (strides, strides)
        strides = tuple(int(v) for v in strides)
        if isinstance(padding, str):
            padding = (
                ((kh // 2, kh // 2), (kw // 2, kw // 2))
                if padding.upper() == "SAME" else ((0, 0), (0, 0))
            )
        elif isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        else:
            padding = tuple(
                (p, p) if isinstance(p, int) else tuple(int(v) for v in p)
                for p in padding
            )
        padding = tuple(
            (int(a), int(b)) for a, b in padding
        )

        # Fold the activation scale (sym scale vector or asym range
        # width) into the kernel, as the chain does.
        sv = scales[path]
        if isinstance(sv, tuple):
            mn, mx = sv
            fold = np.maximum(np.asarray(mx) - np.asarray(mn), 1e-6) / 255.0
        else:
            fold = np.asarray(sv, np.float64)
        w = kernel * fold.reshape(1, 1, -1, 1)  # folded space
        wf = w.reshape(kh * kw * c, o)

        # im2col patches (subsampled rows) from the captured inputs.
        rows = []
        for x in inputs[path]:
            b, hh, ww, _ = x.shape
            ph, pw = padding[0][0], padding[1][0]
            xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
            oh = (hh + 2 * ph - kh) // strides[0] + 1
            ow = (ww + 2 * pw - kw) // strides[1] + 1
            n_pos = b * oh * ow
            take = min(max_rows // len(inputs[path]) + 1, n_pos)
            idx = rng.choice(n_pos, size=take, replace=False)
            bi, rest = np.divmod(idx, oh * ow)
            yi, xi = np.divmod(rest, ow)
            patch = np.empty((take, kh * kw * c))
            for t, (bb, yy, xx) in enumerate(zip(bi, yi, xi)):
                y0, x0 = yy * strides[0], xx * strides[1]
                patch[t] = xp[bb, y0:y0 + kh, x0:x0 + kw, :].reshape(-1)
            # patches are in UNFOLDED activation units; fold: the chain
            # quantizes x/s, so the effective input is x/fold.
            patch /= np.tile(fold, kh * kw)[None, :]
            rows.append(patch)
        X = np.concatenate(rows, axis=0)

        n = wf.shape[0]
        H = X.T @ X
        H += np.eye(n) * damp * np.mean(np.diag(H))
        # GPTQ uses the Cholesky of the INVERSE Hessian (upper).
        Hinv = np.linalg.cholesky(np.linalg.inv(H)).T

        absmax = np.abs(wf).max(axis=0)
        ws = np.maximum(absmax, 1e-6) / 127.0

        Q = np.zeros_like(wf)
        W = wf.copy()
        for i in range(n):
            q = np.clip(np.round(W[i] / ws), -127, 127)
            Q[i] = q
            err = (W[i] - q * ws) / Hinv[i, i]
            if i + 1 < n:
                W[i + 1:] -= np.outer(Hinv[i, i + 1:], err)
        out[path] = (
            Q.reshape(kh, kw, c, o).astype(np.int8),
            ws.astype(np.float32),
        )
    return out
