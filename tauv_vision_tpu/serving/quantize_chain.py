"""Chain-fused int8 serving forwards.

``serving/quantize.py`` quantizes each conv independently: quantize the
bf16 input, int8 conv, dequantize to bf16.  XLA fuses the elementwise
work, but every layer boundary still materializes a bf16 activation
buffer *and* an int8 copy of it (conv operands cannot fuse), so the int8
path pays ~3x the activation traffic of a pure int8 chain and lands at
~42% of the int8 roofline (BENCH.md).

This module re-expresses the hot model forwards so activations stay int8
from conv to conv:

- each conv's epilogue (dequant scale, folded BatchNorm affine,
  relu/leaky-relu, requantize to the NEXT conv's calibrated input scale,
  round, clip, int8 cast) fuses into the conv output — the inter-layer
  buffer is int8;
- BatchNorm (inference = per-channel affine) folds into the epilogue
  multiplier/offset, removing the separate bf16 BN pass;
- residual joins and feature taps keep the flax forward's exact dtype
  flow (BN outputs f32, conv+bias outputs bf16, joins promoted): with
  no calibrated scales the chain is BIT-EXACT vs the flax pipeline at
  bf16 (tests/test_quantize_chain.py), so int8 rungs measure pure
  quantization noise.

Calibration scales come from ``serving.quantize.calibrate`` on the same
model — module paths are identical, so cached scales transfer.  The
requant math matches the per-layer path up to where rounding happens
(the unfused path rounds through bf16 at every boundary; the chain
rounds once, in f32), verified close by tests/test_quantize_chain.py.

Covers the YOLACT serving stack (ResNet-18 backbone, FPN, protonet,
prediction head — yolact/model/model.py:18-60) and the CenterNet
DLA-34 stack (centerpoint_dla.py:476-531).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


BN_EPS = 1e-5


# ---------------------------------------------------------------- helpers


def _get(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def _wq(kernel: jnp.ndarray, in_scale=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 weight quantization (HWIO).

    With ``in_scale`` a per-input-channel activation scale vector, the
    scales are folded into the kernel first (w'[k,c,o] = w * s_in[c]),
    so the int8 accumulator dequantizes with the weight scale alone —
    this is how per-channel activation quantization rides the MXU
    without any change to the conv itself.
    """
    kernel = kernel.astype(jnp.float32)
    if in_scale is not None:
        kernel = kernel * jnp.asarray(in_scale, jnp.float32).reshape(
            (1,) * (kernel.ndim - 2) + (-1, 1)
        )
    absmax = jnp.max(jnp.abs(kernel.reshape(-1, kernel.shape[-1])), axis=0)
    scale = jnp.maximum(absmax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _is_per_channel(scale) -> bool:
    return getattr(scale, "ndim", 0) >= 1


def _quant(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric int8 quantization; ``scale`` is a scalar or a
    per-channel vector broadcast over the trailing (channel) axis."""
    s = jnp.asarray(scale, jnp.float32)
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / s), -127, 127
    ).astype(jnp.int8)


def _asym_offset_map(qk, z, out_hw, in_hw, strides, padding):
    """Zero-point offset for an asymmetric int8 conv, border-exact.

    x ~= s * (q - z) makes the accumulator owe sum(qk * z) per output —
    but only over taps that landed IN BOUNDS: conv's zero padding
    contributes q = 0 where the true activation is 0 (= s * (z - z)),
    so padded taps owe nothing.  The per-tap validity is a separable
    function of the output coordinate, so the offset is a tiny einsum
    of static 0/1 masks with the per-tap zero-point sums — exact at the
    borders, ~H*W*O*KK integer ops (noise next to the conv itself).
    """
    kh, kw = qk.shape[:2]
    offtap = jnp.einsum(
        "abco,c->abo", qk.astype(jnp.int32), jnp.asarray(z, jnp.int32)
    )
    masks = []
    for k, out_d, in_d, stride, pad in (
        (kh, out_hw[0], in_hw[0], strides[0], padding[0][0]),
        (kw, out_hw[1], in_hw[1], strides[1], padding[1][0]),
    ):
        m = np.zeros((k, out_d), np.int32)
        for ki in range(k):
            pos = np.arange(out_d) * stride + ki - pad
            m[ki] = ((pos >= 0) & (pos < in_d)).astype(np.int32)
        masks.append(jnp.asarray(m))
    return jnp.einsum("ay,bx,abo->yxo", masks[0], masks[1], offtap)


def _quant_asym(x: jnp.ndarray, scale, zero) -> jnp.ndarray:
    """Asymmetric int8: q = clip(round(x / s) + z, -128, 127), so
    x ~= s * (q - z).  For ReLU inputs (min 0) z = -128 and the whole
    256-level grid covers [0, max] — half the quantization step of the
    symmetric grid, for free (the zero point folds into a constant
    per-output offset on the accumulator, see run_layer)."""
    s = jnp.asarray(scale, jnp.float32)
    z = jnp.asarray(zero, jnp.float32)
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / s) + z, -128, 127
    ).astype(jnp.int8)


def _bn_affine(params, stats) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference BatchNorm as y = g*x + b (per channel, f32)."""
    g = params["scale"].astype(jnp.float32) / jnp.sqrt(
        stats["var"].astype(jnp.float32) + BN_EPS
    )
    b = params["bias"].astype(jnp.float32) - stats["mean"].astype(
        jnp.float32
    ) * g
    return g, b


def _leaky(y):
    return jax.nn.leaky_relu(y)  # slope 0.01, the reference default


class ChainCtx:
    """Parameters + calibration scales for a chain-fused forward.

    ``scales`` values may be scalars (per-tensor) or per-input-channel
    vectors (``calibrate(per_channel=True)``).  ``corrections`` maps
    conv paths to per-output-channel bias corrections
    (``calibrate_bias_correction``), added to the dequantized
    accumulator before the BN affine.
    """

    def __init__(self, variables, scales: Dict[str, float],
                 dtype=jnp.bfloat16,
                 corrections: Optional[Dict[str, np.ndarray]] = None,
                 gains: Optional[Dict[str, np.ndarray]] = None,
                 ranges: Optional[Dict[str, tuple]] = None,
                 wq_override: Optional[Dict[str, tuple]] = None,
                 f32_paths: Tuple[str, ...] = (),
                 int8_transpose: Optional[str] = None,
                 join_dtype=None):
        self.params = variables["params"]
        self.stats = variables.get("batch_stats", {})
        self.scales = scales
        self.dtype = dtype
        # Path substrings whose UNCALIBRATED convs run in float32
        # instead of ``dtype``.  Built to test whether upcasting the
        # decode-facing head convs buys score parity at the served
        # dtype (VERDICT r3 item 2); the round-4 tenth ladder measured
        # the answer as NO — f32 heads move the decoded deltas vs the
        # f32 pipeline by <2% (score p95 2.25e-3 -> 2.22e-3 over 512
        # images) because the bf16-vs-f32 drift is trunk feature
        # noise, not head logit rounding (BENCH.md round-4 section).
        # Kept as the measurement capability behind the ladder's
        # *-f32heads rungs.
        self.f32_paths = tuple(f32_paths)
        self.corrections = corrections or {}
        self.gains = gains or {}
        # {path: (min[C], max[C])} from quantize.calibrate_range —
        # paths listed here quantize ASYMMETRICALLY (full 256-level
        # grid; the zero point folds into the accumulator offset).
        self.ranges = ranges or {}
        # {path: (qk int8, w_scale)} from quantize.calibrate_gptq —
        # error-compensated weight rounding in the folded space,
        # replacing _wq's round-to-nearest for those paths.
        self.wq_override = wq_override or {}
        # Sequential-correction calibration hooks
        # (calibrate_sequential): pass A (no scales) captures each
        # calibrated conv's float pre-bias output map; pass B consumes
        # them, fitting a per-channel affine (gain, offset) against the
        # int8 accumulator AS IT ACTUALLY ARRIVES — with every upstream
        # layer's correction already applied — then applying it before
        # continuing, so downstream fits see corrected inputs.
        self.capture_paths: Optional[set] = None
        self.capture_into: Optional[Dict[str, np.ndarray]] = None
        self.seq_targets: Optional[Dict[str, np.ndarray]] = None
        self.seq_mode: str = "affine"
        self.gains_out: Optional[Dict[str, np.ndarray]] = None
        self.corrections_out: Optional[Dict[str, np.ndarray]] = None
        # int8 transposed convs (round 4): None keeps the bf16 dilated
        # lowering (the certified-rung default until the ladder says
        # otherwise); "pallas" serves calibrated k3s2 transposes through
        # ops/pallas/transpose_conv (phase-exact int8 GEMMs + fused
        # requant — ~2x the bf16 form's MXU rate and half its HBM write
        # traffic on the protonet upsamples); "phase-xla" the same
        # exact-tap phase math as FOUR XLA int8 convs + per-phase fused
        # epilogues + one int8 interleave (no Mosaic dependency — the
        # GEMM core is XLA's own 393-TOP/s int8 conv); "xla" the
        # bit-identical int8-sim reference (CPU tests; slow on chip).
        # All three are bit-equal to each other.
        self.int8_transpose = int8_transpose
        # Round-4 HBM lever: the flax dtype flow keeps residual joins,
        # feature taps, and their relu outputs in f32 (flax BN runs
        # dtype=f32 and values flow onward unrounded — see run_layer's
        # docstring), so the chain materializes f32 activation maps at
        # every ResNet block boundary (~471 MB per layer1 map at batch
        # 128) even though the consumers immediately requantize to
        # int8.  ``join_dtype=jnp.bfloat16`` rounds those join tensors,
        # halving that traffic.  None (default) keeps the bit-exact
        # flax flow; the bf16-joins serving rung is certified by its
        # own decoded-delta ladder rung (yolact_parity_check
        # 'pc+outputs+head+join16').
        self.join_dtype = join_dtype

    def join(self, x: jnp.ndarray) -> jnp.ndarray:
        """Round a cross-layer join tensor to ``join_dtype`` (no-op in
        the exact-flow default)."""
        return x if self.join_dtype is None else x.astype(self.join_dtype)

    def s(self, path: str) -> float:
        return self.scales[path]

    def bn(self, path: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return _bn_affine(_get(self.params, path), _get(self.stats, path))

    def bn_exact(self, y: jnp.ndarray, path: str) -> jnp.ndarray:
        """Inference BatchNorm with flax's exact op order and dtypes
        (nn.normalization._normalize, dtype=float32): promote to f32,
        y = (x - mean) * (rsqrt(var + eps) * scale) + bias.  The float
        chain must round EXACTLY like the flax forward — the folded
        single-affine form rounds differently and the decoded-parity
        budget is ~1 bf16 ulp."""
        p = _get(self.params, path)
        st = _get(self.stats, path)
        mul = jax.lax.rsqrt(
            st["var"].astype(jnp.float32) + BN_EPS
        ) * p["scale"].astype(jnp.float32)
        return (
            y.astype(jnp.float32) - st["mean"].astype(jnp.float32)
        ) * mul + p["bias"].astype(jnp.float32)

    def has(self, path: str) -> bool:
        return path in self.scales or path in self.ranges

    def asym(self, path: str):
        """(scale[C], zero_point[C]) for an asymmetric path; concrete
        numpy at trace time so the zero offset bakes into the graph."""
        mn, mx = self.ranges[path]
        mn = np.asarray(mn, np.float64)
        mx = np.asarray(mx, np.float64)
        s = np.maximum(mx - mn, 1e-6) / 255.0
        z = np.clip(-128.0 - np.round(mn / s), -128, 127)
        return s.astype(np.float32), z.astype(np.int32)

    def run_layer(
        self,
        inp: jnp.ndarray,
        path: str,
        *,
        strides=(1, 1),
        padding=1,
        transpose: bool = False,
        bn_path: Optional[str] = None,
        act: Optional[str] = None,
        next_path: Optional[str] = None,
    ) -> jnp.ndarray:
        """One conv (or phase transposed conv) + fused epilogue.

        Runs int8 when the layer was calibrated, bf16 otherwise (narrow
        layers fall below calibration's min_in_channels).  Emits int8 in
        ``next_path``'s scale when that layer is calibrated — by
        construction the consumer is exactly ``next_path``, so an int8
        input always arrives in the right scale — float otherwise.

        Float emission mirrors the flax forward's dtype flow EXACTLY:
        BN outputs are f32 (flax BN runs dtype=f32 and its result flows
        onward unrounded), plain conv(+bias) outputs are ``self.dtype``
        (flax Conv adds bias and returns in its dtype).  An earlier
        revision rounded every boundary to bf16; that one extra rounding
        per layer cost ~1.6e-3 decoded score-delta p95 vs the flax
        pipeline — the same size as the entire int8 parity budget.
        """
        p = _get(self.params, path)
        bias = p.get("bias")
        bias = None if bias is None else bias.astype(jnp.float32)
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))

        quantized = False
        if (
            transpose
            and self.int8_transpose
            and path in self.scales
            and path not in self.ranges
            and p["kernel"].shape[:2] == (3, 3)
            and bn_path is None
            and act in (None, "leaky", "relu")
        ):
            # Round-4 int8 transpose: phase-exact int8 GEMMs with the
            # dequant+bias+act+requant epilogue fused into the kernel
            # (ops/pallas/transpose_conv.py).  The dilated bf16 form
            # below sits at its zero-free roof; the int8 phase roof is
            # ~2x lower and this lowering reaches it without the layout
            # passes that killed every XLA-level int8 formulation.
            from tauv_vision_tpu.ops.pallas.transpose_conv import (
                phase_tap_matrices,
                transpose_conv2x_int8_pallas,
                transpose_conv2x_int8_phase_xla,
                transpose_conv2x_int8_xla,
            )

            s_in = self.s(path)
            q = inp if inp.dtype == jnp.int8 else _quant(inp, s_in)
            if path in self.wq_override:
                qk = jnp.asarray(self.wq_override[path][0])
                deq = jnp.asarray(self.wq_override[path][1])
            elif _is_per_channel(s_in):
                qk, deq = _wq(p["kernel"], in_scale=s_in)
            else:
                qk, w_scale = _wq(p["kernel"])
                deq = s_in * w_scale
            deq = jnp.broadcast_to(
                jnp.asarray(deq, jnp.float32),
                (p["kernel"].shape[-1],),
            )
            if path in self.gains:
                deq = deq * jnp.asarray(self.gains[path], jnp.float32)
            bias_eff = jnp.zeros_like(deq) if bias is None else bias
            if path in self.corrections:
                bias_eff = bias_eff + jnp.asarray(
                    self.corrections[path], jnp.float32
                )
            emit_int8 = (
                next_path is not None
                and next_path in self.scales
                and next_path not in self.ranges
            )
            out_scale = (
                self.s(next_path) if emit_int8
                else jnp.ones((), jnp.float32)
            )
            kwargs = dict(
                act=act or "none",
                out_dtype=jnp.int8 if emit_int8 else self.dtype,
            )
            if self.int8_transpose == "xla":
                return transpose_conv2x_int8_xla(
                    q, qk, deq, bias_eff, out_scale, **kwargs
                )
            if self.int8_transpose == "phase-xla":
                return transpose_conv2x_int8_phase_xla(
                    q, qk, deq, bias_eff, out_scale, **kwargs
                )
            return transpose_conv2x_int8_pallas(
                q, phase_tap_matrices(qk), deq, bias_eff, out_scale,
                **kwargs,
            )
        if transpose:
            # Transposed convs stay bf16-dilated: measured on-chip, int8
            # never wins here (serving/quantize.py._should_quantize).
            if inp.dtype == jnp.int8:
                if path in self.ranges:
                    si, zi = self.asym(path)
                    xf = (
                        inp.astype(jnp.float32)
                        - jnp.asarray(zi, jnp.float32)
                    ) * jnp.asarray(si, jnp.float32)
                else:
                    xf = inp.astype(jnp.float32) * self.s(path)
            else:
                xf = inp
            xf = xf.astype(self.dtype)
            flipped = jnp.flip(p["kernel"].astype(self.dtype), axis=(0, 1))
            y = jax.lax.conv_general_dilated(
                xf, flipped, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        elif self.has(path):
            quantized = True
            if path in self.ranges:
                # Asymmetric: x ~= s * (q - z).  The zero-point term is
                # a CONSTANT per-output offset sum(qk * z) over the
                # kernel's spatial x input-channel extent — one small
                # integer reduction, subtracted from the accumulator.
                s_in, z_in = self.asym(path)
                q = (
                    inp if inp.dtype == jnp.int8
                    else _quant_asym(inp, s_in, z_in)
                )
                if path in self.wq_override:
                    qk, w_scale = self.wq_override[path]
                    qk = jnp.asarray(qk)
                    w_scale = jnp.asarray(w_scale)
                else:
                    qk, w_scale = _wq(p["kernel"], in_scale=s_in)
                acc = jax.lax.conv_general_dilated(
                    q, qk, window_strides=tuple(strides), padding=padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                off = _asym_offset_map(
                    qk, z_in, acc.shape[1:3], q.shape[1:3],
                    tuple(strides), padding,
                )
                y = (acc - off[None]).astype(jnp.float32) * w_scale
            else:
                s_in = self.s(path)
                q = inp if inp.dtype == jnp.int8 else _quant(inp, s_in)
                if _is_per_channel(s_in):
                    if path in self.wq_override:
                        qk = jnp.asarray(self.wq_override[path][0])
                        w_scale = jnp.asarray(self.wq_override[path][1])
                    else:
                        qk, w_scale = _wq(p["kernel"], in_scale=s_in)
                    deq = w_scale  # s_in folded into the weights
                else:
                    qk, w_scale = _wq(p["kernel"])
                    deq = s_in * w_scale
                acc = jax.lax.conv_general_dilated(
                    q, qk, window_strides=tuple(strides), padding=padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                y = acc.astype(jnp.float32) * deq
            if path in self.gains:
                y = y * jnp.asarray(self.gains[path], jnp.float32)
            if path in self.corrections:
                y = y + jnp.asarray(self.corrections[path], jnp.float32)
            if self.seq_targets is not None and path in self.seq_targets:
                # Sequential calibration (pass B, eager): fit per-channel
                # affine anchoring this conv's pre-bias output to the
                # float chain's, with all upstream corrections already
                # applied.  Fit once per path (first call wins — for
                # weight-shared heads the largest FPN level comes first);
                # later calls reuse the recorded fit, matching serving.
                if path not in self.gains_out:
                    yf = jnp.asarray(self.seq_targets[path], jnp.float32)
                    mq = y.mean(axis=(0, 1, 2))
                    mf = yf.mean(axis=(0, 1, 2))
                    if self.seq_mode == "affine":
                        var = jnp.square(y - mq).mean(axis=(0, 1, 2))
                        cov = ((y - mq) * (yf - mf)).mean(axis=(0, 1, 2))
                        a = jnp.where(
                            var > 1e-10, cov / jnp.maximum(var, 1e-10), 1.0
                        )
                        a = jnp.clip(a, 0.5, 2.0)
                    else:
                        a = jnp.ones_like(mq)
                    self.gains_out[path] = np.asarray(a, np.float32)
                    self.corrections_out[path] = np.asarray(
                        mf - a * mq, np.float32
                    )
                y = y * jnp.asarray(self.gains_out[path], jnp.float32)
                y = y + jnp.asarray(self.corrections_out[path], jnp.float32)
        else:
            assert inp.dtype != jnp.int8, (
                f"producer emitted int8 but {path} is uncalibrated"
            )
            dt = (
                jnp.float32
                if any(sub in path for sub in self.f32_paths)
                else self.dtype
            )
            xf = inp.astype(dt)
            k = p["kernel"].astype(dt)
            y = jax.lax.conv_general_dilated(
                xf, k, window_strides=tuple(strides), padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if (
                self.capture_into is not None
                and path not in self.capture_into
                and (self.capture_paths is None
                     or path in self.capture_paths)
            ):
                # Sequential calibration pass A: record the float chain's
                # pre-bias output (first call per path, mirroring pass B).
                self.capture_into[path] = np.asarray(y, np.float32)

        if bias is not None:
            # int8: exact f32 add on the dequantized accumulator.
            # float: flax Conv adds bias in the conv dtype.
            y = y + (bias if quantized else bias.astype(y.dtype))
        if bn_path is not None:
            if quantized:
                g, b = self.bn(bn_path)
                y = y * g + b
            else:
                y = self.bn_exact(y, bn_path)
        if act == "relu":
            y = jnp.maximum(y, jnp.zeros((), y.dtype))
        elif act == "leaky":
            y = _leaky(y)
        if next_path is not None and self.has(next_path):
            if next_path in self.ranges:
                return _quant_asym(y, *self.asym(next_path))
            return _quant(y, self.s(next_path))
        if quantized and bn_path is None:
            # Mirror the float path's conv-output rounding so downstream
            # joins see the same dtype the flax forward would produce.
            return y.astype(self.dtype)
        return y


def calibrate_sequential(
    build_forward,
    variables,
    scales: Dict[str, float],
    batch,
    mode: str = "affine",
    dtype=jnp.bfloat16,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Sequential per-channel affine recalibration of an int8 chain.

    ``calibrate_bias_correction`` estimates each conv's quantization
    error with FLOAT inputs, so it misses the error that accumulates
    through the chain — and a static mean is all it can fix.  This runs
    two passes of the SAME chain forward over one calibration batch:

    - pass A: float (bf16) chain, capturing every calibrated conv's
      pre-bias output map — the exact tensors the parity path produces;
    - pass B: int8 chain, eager, fitting per path a per-channel affine
      ``a * y_int8 + b ~= y_float`` least-squares on the accumulator as
      it actually arrives (all upstream fits already applied), then
      applying it before the chain continues.

    ``mode="mean"`` pins ``a = 1`` (offset only).  The returned
    ``(gains, corrections)`` feed ``ChainCtx(gains=..., corrections=...)``
    — at serving they fold into the conv epilogue with the BN affine,
    so the correction is free.

    ``build_forward(ctx) -> fn(batch)`` must construct the chain forward
    around the provided ctx (e.g. ``dla34_chain_forward(..., ctx=ctx)``)
    with any input preprocessing inside ``fn``, and must NOT jit it —
    pass B records fits from concrete (eager) values.
    """
    ctx_a = ChainCtx(variables, {}, dtype=dtype)
    ctx_a.capture_into = {}
    ctx_a.capture_paths = set(scales)
    jax.block_until_ready(build_forward(ctx_a)(batch))

    ctx_b = ChainCtx(variables, scales, dtype=dtype)
    ctx_b.seq_targets = ctx_a.capture_into
    ctx_b.seq_mode = mode
    ctx_b.gains_out = {}
    ctx_b.corrections_out = {}
    jax.block_until_ready(build_forward(ctx_b)(batch))
    return ctx_b.gains_out, ctx_b.corrections_out


# ------------------------------------------------------- ResNet-18 chain


def _basic_block(ctx: ChainCtx, x, prefix: str, stride: int,
                 downsample: bool):
    """BasicBlock (models/resnet.py:30-71) with the conv1->conv2 link in
    int8.  The residual join stays bf16 (reference semantics).  Returns
    (out, pre_residual_tap)."""
    q1 = ctx.run_layer(
        x, f"{prefix}/conv1", strides=(stride, stride), padding=1,
        bn_path=f"{prefix}/bn1", act="relu", next_path=f"{prefix}/conv2",
    )
    pre_residual = ctx.join(ctx.run_layer(
        q1, f"{prefix}/conv2", padding=1, bn_path=f"{prefix}/bn2"
    ))
    if downsample:
        identity = ctx.join(ctx.run_layer(
            x, f"{prefix}/downsample_conv", strides=(stride, stride),
            padding=0, bn_path=f"{prefix}/downsample_bn",
        ))
    else:
        identity = x
    out = jnp.maximum(
        pre_residual + identity.astype(pre_residual.dtype),
        jnp.zeros((), pre_residual.dtype),
    )
    return out, pre_residual


def resnet18_chain(ctx: ChainCtx, img) -> Tuple[jnp.ndarray, ...]:
    """Chain-int8 Resnet18Features forward (models/resnet.py:74-119).
    The 3-channel stem stays bf16 (too narrow to quantize, matching
    serving/quantize.py's min_in_channels policy; run_layer falls back
    on the missing scale)."""
    import flax.linen as nn

    x = ctx.run_layer(
        img, "backbone/conv1", strides=(2, 2), padding=3,
        bn_path="backbone/bn1", act="relu",
    )
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    taps = []
    plan = [(64, 1, False), (128, 2, True), (256, 2, True), (512, 2, True)]
    for layer_i, (_, stride, downsample) in enumerate(plan, start=1):
        x, _ = _basic_block(
            ctx, x, f"backbone/layer{layer_i}_0", stride, downsample
        )
        x, tap = _basic_block(
            ctx, x, f"backbone/layer{layer_i}_1", 1, False
        )
        if layer_i >= 2:
            taps.append(
                tap if ctx.join_dtype is not None
                else tap.astype(jnp.float32)
            )
    return tuple(taps)


# ------------------------------------------------------------- FPN chain


def fpn_chain(ctx: ChainCtx, backbone_outputs, n_downsample: int):
    """Chain-int8 FeaturePyramid forward (models/fpn.py:26-66).  The
    top-down bilinear-resize sum stays bf16 (cross-scale join)."""
    from tauv_vision_tpu.ops.image import resize_bilinear_nhwc

    n_in = len(backbone_outputs)
    laterals = [
        ctx.run_layer(backbone_outputs[i], f"fpn/lateral_{i}", padding=0)
        for i in range(n_in)
    ]

    pyramid = [None] * n_in
    pyramid[-1] = laterals[-1]
    for i in range(n_in - 2, -1, -1):
        above = resize_bilinear_nhwc(
            pyramid[i + 1], laterals[i].shape[1:3]
        )
        pyramid[i] = laterals[i] + above.astype(laterals[i].dtype)

    outputs = [
        ctx.run_layer(pyramid[i], f"fpn/prediction_{i}", padding=1,
                      act="leaky")
        for i in range(n_in)
    ]
    for i in range(n_downsample):
        outputs.append(
            ctx.run_layer(outputs[-1], f"fpn/downsample_{i}",
                          strides=(2, 2), padding=1, act="leaky")
        )
    return outputs


# -------------------------------------------------------- protonet chain


def protonet_chain(ctx: ChainCtx, fpn0, n_pre: int, n_post: int):
    """Chain-int8 Protonet forward (models/protonet.py:24-60): every
    conv->leaky->conv(T) link stays int8."""
    chain = (
        [f"protonet/pre_{i}" for i in range(n_pre)]
        + ["protonet/upsample_1"]
        + [f"protonet/mid_{i}" for i in range(n_post)]
        + ["protonet/upsample_2"]
        + [f"protonet/post_{i}" for i in range(n_post)]
        + ["protonet/output"]
    )
    x = fpn0
    for i, path in enumerate(chain):
        next_path = chain[i + 1] if i + 1 < len(chain) else None
        x = ctx.run_layer(
            x, path,
            transpose="upsample" in path,
            padding=0 if path.endswith("output") else 1,
            act="leaky",
            next_path=next_path,
        )
    return x.astype(jnp.float32)


# ------------------------------------------------- prediction head chain


def _extra_stage(ctx: ChainCtx, x, prefix: str):
    """ExtraStage (models/prediction_head.py:56-71): bottleneck convs
    chain in int8; the relu(conv + bn) join stays bf16."""
    bp = f"{prefix}/bottleneck"
    q = ctx.run_layer(x, f"{bp}/conv1", padding=0, bn_path=f"{bp}/bn1",
                      act="relu", next_path=f"{bp}/conv2")
    q = ctx.run_layer(q, f"{bp}/conv2", padding=1, bn_path=f"{bp}/bn2",
                      act="relu", next_path=f"{bp}/conv3")
    pre = ctx.run_layer(q, f"{bp}/conv3", padding=0, bn_path=f"{bp}/bn3")
    bottleneck = jnp.maximum(pre + x.astype(jnp.float32), 0.0)

    # stage bn applies to the bottleneck output; parallel 1x1 conv on x.
    bn_out = ctx.bn_exact(bottleneck, f"{prefix}/bn")
    conv_out = ctx.run_layer(x, f"{prefix}/conv", padding=0)
    return jnp.maximum(conv_out.astype(jnp.float32) + bn_out, 0.0)


def prediction_head_chain(
    ctx: ChainCtx, fpn_output, *, n_classes: int, n_prototype_masks: int,
    n_shared: int, n_cls: int, n_box: int, n_mask: int,
):
    """Chain-int8 PredictionHead forward (models/prediction_head.py:74-134)
    for one FPN level."""
    x = fpn_output
    for i in range(n_shared):
        x = _extra_stage(ctx, x, f"prediction_head/shared_{i}")

    def branch(x, stages, stage_fmt, out_path):
        for i in range(stages):
            x = _extra_stage(ctx, x, stage_fmt.format(i))
        return ctx.run_layer(x, out_path, padding=1)

    b = fpn_output.shape[0]
    classification = branch(
        x, n_cls, "prediction_head/cls_{}", "prediction_head/classification"
    ).reshape(b, -1, n_classes + 1)
    box = branch(
        x, n_box, "prediction_head/box_{}", "prediction_head/box"
    ).reshape(b, -1, 4)
    mask = jnp.tanh(
        branch(
            x, n_mask, "prediction_head/mask_{}", "prediction_head/mask"
        ).reshape(b, -1, n_prototype_masks)
    ).astype(jnp.float32)
    return (
        classification.astype(jnp.float32),
        box.astype(jnp.float32),
        mask,
    )



# ------------------------------------------------------ YOLACT assembly


def yolact_chain_forward(model_config, variables, scales: Dict[str, float],
                         dtype=jnp.bfloat16, corrections=None, gains=None,
                         ranges=None, wq_override=None, ctx=None,
                         f32_paths=(), int8_transpose=None,
                         join_dtype=None):
    """Returns ``fn(img) -> YolactPrediction`` running the chain-int8
    YOLACT forward (models/yolact.py:50-116)."""
    from tauv_vision_tpu.models.yolact import YolactPrediction
    from tauv_vision_tpu.ops.anchors import get_all_anchors

    cfg = model_config
    if ctx is None:
        ctx = ChainCtx(variables, scales, dtype=dtype,
                       corrections=corrections, gains=gains, ranges=ranges,
                       wq_override=wq_override, f32_paths=f32_paths,
                       int8_transpose=int8_transpose,
                       join_dtype=join_dtype)
    anchor = jnp.asarray(
        get_all_anchors(cfg.in_h, cfg.in_w, cfg.n_fpn_levels,
                        cfg.anchor_scales, cfg.anchor_aspect_ratios)
    )

    def forward(img):
        taps = resnet18_chain(ctx, img)
        fpn_outputs = fpn_chain(ctx, taps, cfg.n_fpn_downsample_layers)
        proto = protonet_chain(
            ctx, fpn_outputs[0], cfg.n_masknet_layers_pre_upsample,
            cfg.n_masknet_layers_post_upsample,
        )
        cls_l, box_l, mask_l = [], [], []
        for f in fpn_outputs:
            c, bx, mk = prediction_head_chain(
                ctx, f, n_classes=cfg.n_classes,
                n_prototype_masks=cfg.n_prototype_masks,
                n_shared=cfg.n_prediction_head_layers,
                n_cls=cfg.n_classification_layers,
                n_box=cfg.n_box_layers, n_mask=cfg.n_mask_layers,
            )
            cls_l.append(c)
            box_l.append(bx)
            mask_l.append(mk)
        return YolactPrediction(
            classification=jnp.concatenate(cls_l, axis=1),
            box_encoding=jnp.concatenate(box_l, axis=1),
            mask_coeff=jnp.concatenate(mask_l, axis=1),
            anchor=anchor,
            mask_prototype=proto,
        )

    return forward


def make_yolact_chain_pipeline(
    model_config, variables, scales: Dict[str, float],
    top_k: int = 20, iou_threshold: float = 0.5,
    confidence_threshold: float = 0.5, dtype=jnp.bfloat16, jit: bool = True,
    corrections=None, gains=None, int8_transpose=None, join_dtype=None,
):
    """uint8 frames -> decoded YolactDetections via the chain-int8
    forward (drop-in for make_yolact_pipeline + quantized_call)."""
    from tauv_vision_tpu.ops.image import preprocess
    from tauv_vision_tpu.serving.yolact_decode import decode_yolact

    cfg = model_config
    forward = yolact_chain_forward(cfg, variables, scales, dtype=dtype,
                                   corrections=corrections, gains=gains,
                                   int8_transpose=int8_transpose,
                                   join_dtype=join_dtype)

    def pipeline(img_uint8):
        img = preprocess(
            img_uint8, (cfg.in_h, cfg.in_w), cfg.img_mean, cfg.img_stddev,
            dtype=dtype,
        )
        prediction = forward(img)
        return decode_yolact(
            prediction, cfg, top_k, iou_threshold, confidence_threshold
        )

    return jax.jit(pipeline) if jit else pipeline

# ---------------------------------------------- CenterNet DLA-34 chain


def _dla_basic_block(ctx: ChainCtx, x, prefix: str, stride: int, residual):
    """DLA BasicBlock (centerpoint_dla.py BasicBlock): the conv1->conv2
    link stays int8; the residual join stays bf16."""
    from tauv_vision_tpu.models.dla import pad_to_match

    q = ctx.run_layer(
        x, f"{prefix}/conv1", strides=(stride, stride), padding=1,
        bn_path=f"{prefix}/bn1", act="relu", next_path=f"{prefix}/conv2",
    )
    out = ctx.join(ctx.run_layer(q, f"{prefix}/conv2", padding=1,
                                 bn_path=f"{prefix}/bn2"))
    residual = pad_to_match(residual, out.shape[1:3])
    return jnp.maximum(
        out + residual.astype(out.dtype), jnp.zeros((), out.dtype)
    )


def _dla_root(ctx: ChainCtx, children, prefix: str):
    jd = ctx.join_dtype or jnp.float32
    x = jnp.concatenate([c.astype(jd) for c in children], axis=-1)
    out = ctx.join(ctx.run_layer(x, f"{prefix}/conv", padding=0,
                                 bn_path=f"{prefix}/bn"))
    return jnp.maximum(out, jnp.zeros((), out.dtype))


def _dla_tree(ctx: ChainCtx, x, prefix: str, levels: int, in_ch: int,
              out_ch: int, stride: int = 1, level_root: bool = False,
              root_dim: int = 0, children=None):
    """HDA tree (centerpoint_dla.py Tree), path-mirrored."""
    import flax.linen as nn

    children = [] if children is None else list(children)
    if root_dim == 0:
        root_dim = 2 * out_ch
    if level_root:
        root_dim += in_ch

    bottom = x
    if stride > 1:
        pad_h = (-x.shape[1]) % stride
        pad_w = (-x.shape[2]) % stride
        bottom = nn.max_pool(
            x, (stride, stride), strides=(stride, stride),
            padding=((0, pad_h), (0, pad_w)),
        )
    proj = bottom
    if in_ch != out_ch:
        proj = ctx.run_layer(bottom, f"{prefix}/project_conv", padding=0,
                             bn_path=f"{prefix}/project_bn")

    if level_root:
        children.append(bottom)

    if levels == 1:
        x1 = _dla_basic_block(ctx, x, f"{prefix}/tree1", stride, proj)
        x2 = _dla_basic_block(ctx, x1, f"{prefix}/tree2", 1, x1)
        return _dla_root(ctx, [x2, x1] + children, f"{prefix}/root")

    x1 = _dla_tree(ctx, x, f"{prefix}/tree1", levels - 1, in_ch, out_ch,
                   stride=stride, root_dim=0)
    children.append(x1)
    return _dla_tree(ctx, x1, f"{prefix}/tree2", levels - 1, out_ch, out_ch,
                     root_dim=root_dim + out_ch, children=children)


def dla_trunk_chain(ctx: ChainCtx, img):
    """DLA-34 trunk (centerpoint_dla.py DLATrunk), chain-int8.  The
    3-channel stem stays bf16 (run_layer falls back on the missing
    scale)."""
    from tauv_vision_tpu.models.centerpoint_dla import (
        DLA34_CHANNELS,
        DLA34_LEVELS,
    )

    x = ctx.run_layer(img, "model/base/base_conv", padding=3,
                      bn_path="model/base/base_bn", act="relu")
    outputs = []
    for level_i in (0, 1):
        stride = 1 if level_i == 0 else 2
        for conv_i in range(DLA34_LEVELS[level_i]):
            x = ctx.run_layer(
                x, f"model/base/level{level_i}_conv{conv_i}",
                strides=(stride if conv_i == 0 else 1,) * 2, padding=1,
                bn_path=f"model/base/level{level_i}_bn{conv_i}", act="relu",
            )
        outputs.append(x)

    for level_i in (2, 3, 4, 5):
        x = _dla_tree(
            ctx, x, f"model/base/level{level_i}", DLA34_LEVELS[level_i],
            DLA34_CHANNELS[level_i - 1], DLA34_CHANNELS[level_i],
            stride=2, level_root=(level_i != 2),
        )
        outputs.append(x)
    return outputs


def _depthwise_upsample(ctx: ChainCtx, x, path: str, factor: int):
    """DepthwiseUpsample (centerpoint_dla.py DepthwiseUpsample):
    dilated depthwise correlation, kept bf16 (no MXU contraction to
    quantize).  The zero-free phase form measured slower end-to-end at
    f=2 AND cost 15% whole-model fps at f=4 despite a 37x standalone
    win (layout interaction; see the flax module's comment)."""
    kernel = _get(ctx.params, path)["kernel"]
    f = factor
    k = 2 * f
    c = x.shape[-1]
    pad = k - 1 - f // 2
    flipped = jnp.flip(kernel, axis=(0, 1)).astype(ctx.dtype)
    return jax.lax.conv_general_dilated(
        x.astype(ctx.dtype), flipped, (1, 1), ((pad, pad), (pad, pad)),
        lhs_dilation=(f, f), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _dcn_block_chain(ctx: ChainCtx, x, path: str, *,
                     max_offset: float, offset_bound,
                     dcn_impl: str = "pallas"):
    """DeformConvBlock (deform=True) inside the chain: merged 27-lane
    offset+mask conv (models/centerpoint_dla.DeformConvBlock's serving
    form) -> bounded-offset Pallas DCN (lerp variant for radii <= 1) ->
    flax-exact BN + relu.  The DCN stage itself stays bf16 — the kernel
    is VPU-sampling-bound at the measured 1.2 Tel-ops/s roof (BENCH.md
    "Deformable-conv serving"), so int8 buys nothing here; the chain's
    win for --deform is keeping the TRUNK's activations int8 across
    conv links instead of paying the per-layer interceptor's
    bf16+int8-copy double buffer at every boundary.

    ``dcn_impl`` mirrors DeformConvBlock.dcn_impl ("pallas" the serving
    default; "shift" the XLA formulation, used by CPU tests where
    Mosaic can't run)."""
    p = _get(ctx.params, path)
    xf = x.astype(ctx.dtype)
    kom = jnp.concatenate(
        [p["offset"]["kernel"], p["mask"]["kernel"]], axis=-1
    ).astype(ctx.dtype)
    bom = jnp.concatenate(
        [p["offset"]["bias"], p["mask"]["bias"]], axis=-1
    ).astype(ctx.dtype)
    om = jax.lax.conv_general_dilated(
        xf, kom, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bom
    offset, mask = om[..., :18], om[..., 18:]
    if offset_bound is not None:
        bound = jnp.asarray(offset_bound, offset.dtype)
        offset = bound * jnp.tanh(offset / bound)
    mask = jax.nn.sigmoid(mask)
    if dcn_impl == "pallas":
        from tauv_vision_tpu.ops.pallas.deform_conv import (
            deform_conv2d_pallas,
        )

        out = deform_conv2d_pallas(
            xf,
            offset.astype(jnp.float32),
            mask.astype(jnp.float32),
            p["weight"].astype(ctx.dtype),
            p["bias"],
            padding=1,
            max_offset=max_offset,
            variant="lerp" if max_offset <= 1 else "full",
        )
    else:
        from tauv_vision_tpu.ops.deform_conv import deform_conv2d_shift

        out = deform_conv2d_shift(
            xf,
            offset.astype(jnp.float32),
            mask.astype(jnp.float32),
            p["weight"].astype(ctx.dtype),
            p["bias"],
            padding=1,
            max_offset=max_offset,
        )
    y = ctx.bn_exact(out, f"{path}/bn")
    return jnp.maximum(y, jnp.zeros((), y.dtype))


def _ida_stage_chain(ctx: ChainCtx, layers, prefix: str, up_factors,
                     deform: bool = False, dcn_max_offset: float = 1.0,
                     offset_bound=None, dcn_impl: str = "pallas"):
    """IDAUpStage, chain-int8.  ``deform=False`` runs the plain-conv
    DeformConvBlock path (the headline serving config); ``deform=True``
    the bounded-DCN blocks via :func:`_dcn_block_chain`."""
    from tauv_vision_tpu.models.dla import pad_to_match

    layers = list(layers)
    for i in range(1, len(layers)):
        if deform:
            projected = _dcn_block_chain(
                ctx, layers[i], f"{prefix}/proj_{i}",
                max_offset=dcn_max_offset, offset_bound=offset_bound,
                dcn_impl=dcn_impl,
            )
        else:
            projected = ctx.run_layer(
                layers[i], f"{prefix}/proj_{i}/conv", padding=1,
                bn_path=f"{prefix}/proj_{i}/bn", act="relu",
            )
        if up_factors[i] > 1:
            upsampled = _depthwise_upsample(
                ctx, projected, f"{prefix}/up_{i}", int(up_factors[i])
            )
        else:
            upsampled = projected
        upsampled = pad_to_match(upsampled, layers[i - 1].shape[1:3])
        jd = ctx.join_dtype or jnp.float32
        joined = upsampled.astype(jd) + layers[i - 1].astype(jd)
        if deform:
            layers[i] = _dcn_block_chain(
                ctx, joined, f"{prefix}/node_{i}",
                max_offset=dcn_max_offset, offset_bound=offset_bound,
                dcn_impl=dcn_impl,
            )
        else:
            layers[i] = ctx.run_layer(
                joined, f"{prefix}/node_{i}/conv", padding=1,
                bn_path=f"{prefix}/node_{i}/bn", act="relu",
            )
    return layers


def dla34_chain_forward(object_config, variables,
                        scales: Dict[str, float], dtype=jnp.bfloat16,
                        corrections=None, gains=None, ranges=None,
                        wq_override=None, ctx=None, f32_paths=(),
                        deform=False, dcn_max_offset: float = 1.0,
                        offset_bound=None, dcn_impl: str = "pallas",
                        join_dtype=None):
    """Chain-int8 CenterpointDLA34 forward -> Prediction
    (models/centerpoint_dla.py DLASeg + CenterpointDLA34).

    ``deform=False``: plain-conv IDA, the bench serving configuration.
    ``deform=True``: the reference's DCN-IDA aggregation
    (centerpoint_dla.py:360-392) with bounded offsets through the
    Pallas kernel — int8 trunk + bf16 DCN stages (the round-4 chain
    serving of ``bench.py --deform``, VERDICT r3 item 4)."""
    from tauv_vision_tpu.configs.centernet import get_head_channels
    from tauv_vision_tpu.models.centernet import Prediction
    from tauv_vision_tpu.models.centerpoint_dla import DLA34_CHANNELS

    if ctx is None:
        ctx = ChainCtx(variables, scales, dtype=dtype,
                       corrections=corrections, gains=gains, ranges=ranges,
                       wq_override=wq_override, f32_paths=f32_paths,
                       join_dtype=join_dtype)
    oc = object_config
    head_channels = get_head_channels(oc)
    first_level = 2  # down_ratio 4
    last_level = 5

    def forward(img):
        levels = dla_trunk_chain(ctx, img)

        # DLAUp (centerpoint_dla.py DLAUp): iterative IDA aggregation.
        layers = list(levels[first_level:])
        n = len(layers)
        channels = list(DLA34_CHANNELS[first_level:])
        scl = np.array([2 ** i for i in range(n)], dtype=int)
        out = [layers[-1]]
        for i in range(n - 1):
            j = -i - 2
            updated = _ida_stage_chain(
                ctx, layers[j:], f"model/dla_up/ida_{i}",
                (scl[j:] // scl[j]).tolist(),
                deform=deform, dcn_max_offset=dcn_max_offset,
                offset_bound=offset_bound, dcn_impl=dcn_impl,
            )
            layers[j:] = updated
            scl[j + 1:] = scl[j]
            out.insert(0, layers[-1])

        y = list(out[: last_level - first_level])
        up_factors = [2 ** i for i in range(last_level - first_level)]
        y = _ida_stage_chain(ctx, y, "model/ida_up", up_factors,
                             deform=deform,
                             dcn_max_offset=dcn_max_offset,
                             offset_bound=offset_bound,
                             dcn_impl=dcn_impl)
        features = y[-1]

        outputs = []
        for head_i, _ in enumerate(head_channels):
            h = ctx.run_layer(
                features, f"model/head_{head_i}_conv", padding=1,
                act="relu", next_path=f"model/head_{head_i}_out",
            )
            h = ctx.run_layer(h, f"model/head_{head_i}_out", padding=0)
            outputs.append(h.astype(jnp.float32))

        # Head-order unpacking (models/centerpoint_dla.py
        # CenterpointDLA34.__call__).
        out_list = list(outputs)
        heatmap = out_list.pop(0)
        keypoint_heatmap = None
        keypoint_affinity = None
        if oc.train_keypoints:
            keypoint_heatmap = out_list.pop(0)
            aff = out_list.pop(0)
            b, hh, ww, _ = aff.shape
            keypoint_affinity = aff.reshape(b, hh, ww, oc.n_keypoints, 2)
        size = out_list.pop(0)
        offset = out_list.pop(0)
        yaw_bin = out_list.pop(0) if oc.train_yaw else None
        yaw_offset = out_list.pop(0) if oc.train_yaw else None
        pitch_bin = out_list.pop(0) if oc.train_pitch else None
        pitch_offset = out_list.pop(0) if oc.train_pitch else None
        roll_bin = out_list.pop(0) if oc.train_roll else None
        roll_offset = out_list.pop(0) if oc.train_roll else None
        depth = out_list.pop(0) if oc.train_depth else None
        return Prediction(
            heatmap=heatmap,
            keypoint_heatmap=keypoint_heatmap,
            keypoint_affinity=keypoint_affinity,
            size=size,
            offset=offset,
            yaw_bin=yaw_bin, yaw_offset=yaw_offset,
            pitch_bin=pitch_bin, pitch_offset=pitch_offset,
            roll_bin=roll_bin, roll_offset=roll_offset,
            depth=depth,
        )

    return forward


def make_centernet_chain_pipeline(
    model_config, object_config, variables, scales: Dict[str, float],
    n_detections: int = 10, score_threshold: float = 0.6,
    dtype=jnp.bfloat16, jit: bool = True, corrections=None, gains=None,
    deform=False, dcn_max_offset: float = 1.0, offset_bound=None,
    dcn_impl: str = "pallas", join_dtype=None,
):
    """uint8 frames -> decoded Detections via the chain-int8 DLA-34
    forward (drop-in for make_centernet_pipeline + quantized_call)."""
    from tauv_vision_tpu.ops.image import preprocess
    from tauv_vision_tpu.serving.centernet_decode import decode
    from tauv_vision_tpu.serving.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STDDEV,
    )

    forward = dla34_chain_forward(object_config, variables, scales,
                                  dtype=dtype, corrections=corrections,
                                  gains=gains, deform=deform,
                                  dcn_max_offset=dcn_max_offset,
                                  offset_bound=offset_bound,
                                  dcn_impl=dcn_impl, join_dtype=join_dtype)

    def pipeline(img_uint8):
        img = preprocess(
            img_uint8, (model_config.in_h, model_config.in_w),
            IMAGENET_MEAN, IMAGENET_STDDEV, dtype=dtype,
        )
        prediction = forward(img)
        return decode(prediction, model_config, n_detections,
                      score_threshold)

    return jax.jit(pipeline) if jit else pipeline


def make_centernet_keypoint_chain_pipeline(
    model_config, object_config, variables, scales: Dict[str, float],
    projection_matrix,
    n_detections: int = 10, keypoint_n_detections: int = 50,
    score_threshold: float = 0.6, keypoint_score_threshold: float = 0.3,
    dtype=jnp.bfloat16, jit: bool = True, corrections=None, gains=None,
):
    """Chain-int8 keypoint+PnP pipeline: the centernet node's FULL
    configuration (centernet_node.py:106-116) over the chain-fused
    DLA-34 forward (dla34_chain_forward emits every head, including
    keypoint heatmap/affinity, so only the decode differs from
    make_centernet_chain_pipeline)."""
    from tauv_vision_tpu.ops.image import preprocess
    from tauv_vision_tpu.serving.centernet_decode import decode_keypoints
    from tauv_vision_tpu.serving.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STDDEV,
    )

    projection_matrix = jnp.asarray(projection_matrix)
    forward = dla34_chain_forward(object_config, variables, scales,
                                  dtype=dtype, corrections=corrections,
                                  gains=gains)

    def pipeline(img_uint8):
        img = preprocess(
            img_uint8, (model_config.in_h, model_config.in_w),
            IMAGENET_MEAN, IMAGENET_STDDEV, dtype=dtype,
        )
        prediction = forward(img)
        return decode_keypoints(
            prediction, model_config, object_config, projection_matrix,
            n_detections, keypoint_n_detections,
            score_threshold, keypoint_score_threshold,
        )

    return jax.jit(pipeline) if jit else pipeline


# ------------------------------------------------------ YOLO-Pose chain


def _pointnet_stage_chain(ctx: ChainCtx, x, prefix: str, kernel: int,
                          count: int):
    """PointnetStage (models/pointnet.py:17-42) with every conv->leaky->
    conv link int8: conv_0..conv_{n} -> reduce(1x1) -> out(1x1), leaky
    between convs, none after ``out``."""
    chain = (
        [f"{prefix}/conv_0"]
        + [f"{prefix}/conv_{i + 1}" for i in range(count - 2)]
        + [f"{prefix}/reduce", f"{prefix}/out"]
    )
    pads = [kernel // 2] * (count - 1) + [0, 0]
    for i, (path, pad) in enumerate(zip(chain, pads)):
        last = i == len(chain) - 1
        x = ctx.run_layer(
            x, path, padding=pad,
            act=None if last else "leaky",
            next_path=None if last else chain[i + 1],
        )
    return x.astype(jnp.float32)


def _pointnet_chain(ctx: ChainCtx, fpn1, pointnet_layers):
    """Pointnet cascade (models/pointnet.py:45-84): stage 0 consumes FPN
    features; later stages re-consume (belief, affinity, features)
    concats (bf16 joins, requantized at each stage's first conv)."""
    beliefs, affinities = [], []
    belief = affinity = None
    for stage_i, (kernel, count, _final) in enumerate(pointnet_layers):
        if stage_i == 0:
            x = fpn1
        else:
            x = jnp.concatenate(
                [belief.astype(ctx.dtype), affinity.astype(ctx.dtype),
                 fpn1.astype(ctx.dtype)], axis=-1
            )
        belief = _pointnet_stage_chain(
            ctx, x, f"pointnet/belief_{stage_i}", kernel, count
        )
        aff_in = (
            jnp.concatenate(
                [belief.astype(ctx.dtype), affinity.astype(ctx.dtype),
                 fpn1.astype(ctx.dtype)], axis=-1
            )
            if stage_i > 0 else fpn1
        )
        affinity = _pointnet_stage_chain(
            ctx, aff_in, f"pointnet/affinity_{stage_i}", kernel, count
        )
        beliefs.append(belief)
        affinities.append(affinity)
    return beliefs, affinities


def _yolo_pose_head_chain(ctx: ChainCtx, fpn_output, cfg):
    """YoloPoseHead (models/yolo_pose.py YoloPoseHead): shared
    ExtraStages then five 3x3 output convs."""
    x = fpn_output
    for i in range(cfg.n_prediction_head_layers):
        x = _extra_stage(ctx, x, f"prediction_head/shared_{i}")
    b = fpn_output.shape[0]

    def out(path, reshape, tanh=False):
        y = ctx.run_layer(x, f"prediction_head/{path}", padding=1)
        y = y.reshape(reshape)
        if tanh:
            y = jnp.tanh(y)
        return y.astype(jnp.float32)

    return (
        out("classification", (b, -1, cfg.n_classes + 1)),
        out("box", (b, -1, 4)),
        out("mask", (b, -1, cfg.n_prototype_masks), tanh=True),
        out("belief",
            (b, -1, cfg.belief_depth, cfg.prototype_belief_depth),
            tanh=True),
        out("affinity",
            (b, -1, cfg.affinity_depth, cfg.prototype_affinity_depth),
            tanh=True),
    )


def yolo_pose_chain_forward(model_config, variables,
                            scales: Dict[str, float], dtype=jnp.bfloat16,
                            corrections=None, gains=None, ranges=None,
                            wq_override=None, ctx=None):
    """Chain-int8 YoloPose forward (models/yolo_pose.py YoloPose;
    reference intent yolo_pose/model/model.py:20-68).  Requires the
    ResNet-18 backbone (the bench/serving configuration)."""
    from tauv_vision_tpu.models.yolo_pose import YoloPosePrediction
    from tauv_vision_tpu.ops.anchors import get_all_anchors

    cfg = model_config
    if cfg.backbone_depth != 18:
        raise NotImplementedError(
            "chain forward covers the ResNet-18 backbone"
        )
    if ctx is None:
        ctx = ChainCtx(variables, scales, dtype=dtype,
                       corrections=corrections, gains=gains, ranges=ranges,
                       wq_override=wq_override)
    anchor = jnp.asarray(
        get_all_anchors(cfg.in_h, cfg.in_w, cfg.n_fpn_levels,
                        cfg.anchor_scales, cfg.anchor_aspect_ratios)
    )

    def forward(img):
        taps = resnet18_chain(ctx, img)
        fpn_outputs = fpn_chain(ctx, taps, cfg.n_fpn_downsample_layers)
        proto = protonet_chain(
            ctx, fpn_outputs[0], cfg.n_masknet_layers_pre_upsample,
            cfg.n_masknet_layers_post_upsample,
        )
        beliefs, affinities = _pointnet_chain(
            ctx, fpn_outputs[1], cfg.pointnet_layers
        )
        outs = [_yolo_pose_head_chain(ctx, f, cfg) for f in fpn_outputs]
        return YoloPosePrediction(
            classification=jnp.concatenate([o[0] for o in outs], axis=1),
            box_encoding=jnp.concatenate([o[1] for o in outs], axis=1),
            mask_coeff=jnp.concatenate([o[2] for o in outs], axis=1),
            belief_coeff=jnp.concatenate([o[3] for o in outs], axis=1),
            affinity_coeff=jnp.concatenate([o[4] for o in outs], axis=1),
            anchor=anchor,
            mask_prototype=proto,
            belief_prototypes=tuple(beliefs),
            affinity_prototypes=tuple(affinities),
        )

    return forward


def make_yolo_pose_chain_pipeline(
    model_config, variables, scales: Dict[str, float],
    top_k: int = 10, iou_threshold: float = 0.5,
    confidence_threshold: float = 0.5,
    keypoint_score_threshold: float = 0.3,
    object_points=None, camera_matrix=None,
    dtype=jnp.bfloat16, jit: bool = True, corrections=None, gains=None,
    split_pnp="auto",
):
    """uint8 frames -> decoded YOLO-Pose keypoints via the chain-int8
    forward (drop-in for make_yolo_pose_pipeline + quantized_call).
    ``split_pnp`` as in make_yolo_pose_pipeline (runtime-probed PnP
    dispatch split)."""
    from tauv_vision_tpu.ops.image import preprocess
    from tauv_vision_tpu.serving.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STDDEV,
    )
    from tauv_vision_tpu.serving.yolo_pose_decode import (
        attach_pnp,
        decode_yolo_pose,
    )

    cfg = model_config
    if object_points is not None:
        object_points = jnp.asarray(object_points)
    if camera_matrix is not None:
        camera_matrix = jnp.asarray(camera_matrix)
    want_pnp = object_points is not None and camera_matrix is not None
    forward = yolo_pose_chain_forward(cfg, variables, scales, dtype=dtype,
                                      corrections=corrections, gains=gains)

    def make(fuse_pnp: bool):
        def pipeline(img_uint8):
            img = preprocess(
                img_uint8, (cfg.in_h, cfg.in_w), IMAGENET_MEAN,
                IMAGENET_STDDEV, dtype=dtype,
            )
            prediction = forward(img)
            return decode_yolo_pose(
                prediction, cfg, top_k, iou_threshold,
                confidence_threshold, keypoint_score_threshold,
                object_points=object_points if fuse_pnp else None,
                camera_matrix=camera_matrix if fuse_pnp else None,
            )

        return pipeline

    if not jit:
        return make(want_pnp)

    split = False
    if want_pnp:
        if split_pnp == "auto":
            from tauv_vision_tpu.serving.runtime_probe import (
                fused_pnp_supported,
            )

            split = not fused_pnp_supported()
        else:
            split = bool(split_pnp)

    if not split:
        return jax.jit(make(want_pnp))

    base = jax.jit(make(False))
    pnp_fn = jax.jit(
        lambda d: attach_pnp(
            d, cfg, object_points, camera_matrix,
            keypoint_score_threshold,
        )
    )

    def split_pipeline(img_uint8):
        return pnp_fn(base(img_uint8))

    return split_pipeline
