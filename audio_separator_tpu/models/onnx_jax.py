"""ONNX graph → jitted JAX program.

TPU-native replacement for the reference's ONNX Runtime dependency
(ref: mdx_separator.py:108-133 runs MDX ``.onnx`` models through
``ort.InferenceSession``; the onnx2torch fallback at :125-133 re-targets
torch). Here the graph is interpreted once at trace time into a pure JAX
function — XLA then fuses the whole Conv-TDF network, and the surrounding
STFT/iSTFT, into a single TPU program.

Approach:
* Weights (initializers) live in a params dict passed per call, so the traced
  program is weight-agnostic and cacheable.
* Shape-machinery ops (Shape/Gather/Concat/Cast chains feeding Reshape/Slice)
  are constant-folded with numpy at trace time — tracer shapes are static, so
  every data-dependent-looking reshape in torch exports resolves statically.
* Tensor layout follows ONNX/torch NCHW; convs map to
  ``lax.conv_general_dilated`` with feature groups.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .onnx_proto import Graph, Model, Node, load_model

_DTYPE_MAP = {
    1: jnp.float32, 2: jnp.uint8, 3: jnp.int8, 6: jnp.int32, 7: jnp.int64,
    9: jnp.bool_, 10: jnp.float16, 11: jnp.float64, 16: jnp.bfloat16,
}


def _is_const(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int, float, bool))


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _pair_pads(pads: Sequence[int], rank: int):
    """ONNX pads [x1b, x2b, ..., x1e, x2e, ...] → [(b, e), ...] per spatial axis."""
    half = len(pads) // 2
    return [(int(pads[i]), int(pads[i + half])) for i in range(half)]


class OnnxToJax:
    """Builds a ``fn(params, *inputs) -> [outputs]`` from an ONNX graph."""

    def __init__(self, model: Model):
        self.model = model
        self.graph: Graph = model.graph
        self.params: Dict[str, np.ndarray] = dict(self.graph.initializers)
        init_names = set(self.params)
        self.input_names = [vi.name for vi in self.graph.inputs if vi.name not in init_names]
        self.output_names = [vi.name for vi in self.graph.outputs]

    # -- public ------------------------------------------------------------

    def make_fn(self) -> Callable:
        """Returns fn(params, *inputs) evaluating the graph."""
        nodes = self.graph.nodes
        input_names = self.input_names
        output_names = self.output_names

        def fn(params, *inputs):
            env: Dict[str, Any] = {"": None}
            for name in self.params:
                env[name] = params[name]
            for name, value in zip(input_names, inputs):
                env[name] = value
            for node in nodes:
                results = self._exec(node, env)
                for out_name, result in zip(node.outputs, results):
                    if out_name:
                        env[out_name] = result
            return [env[name] for name in output_names]

        return fn

    # -- op dispatch -------------------------------------------------------

    def _exec(self, node: Node, env: Dict[str, Any]) -> List[Any]:
        handler = getattr(self, f"op_{node.op_type}", None)
        if handler is None:
            raise NotImplementedError(f"ONNX op not supported: {node.op_type}")
        args = [env[n] if n else None for n in node.inputs]
        result = handler(node, *args)
        return result if isinstance(result, (list, tuple)) else [result]

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _shape_of(x) -> tuple:
        return tuple(_np(x).shape) if _is_const(x) else tuple(x.shape)

    # -- elementwise / activation -----------------------------------------

    def op_Relu(self, node, x):
        return jnp.maximum(x, 0)

    def op_LeakyRelu(self, node, x):
        alpha = node.attrs.get("alpha", 0.01)
        return jnp.where(x >= 0, x, x * alpha)

    def op_Elu(self, node, x):
        alpha = node.attrs.get("alpha", 1.0)
        return jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1.0))

    def op_Sigmoid(self, node, x):
        return jax.nn.sigmoid(x)

    def op_Tanh(self, node, x):
        return jnp.tanh(x)

    def op_Softmax(self, node, x):
        return jax.nn.softmax(x, axis=node.attrs.get("axis", -1))

    def op_Erf(self, node, x):
        return jax.scipy.special.erf(x)

    def op_Sqrt(self, node, x):
        return jnp.sqrt(x)

    def op_Exp(self, node, x):
        return jnp.exp(x)

    def op_Log(self, node, x):
        return jnp.log(x)

    def op_Neg(self, node, x):
        return -x

    def op_Abs(self, node, x):
        return jnp.abs(x)

    def op_Reciprocal(self, node, x):
        return 1.0 / x

    def op_Clip(self, node, x, lo=None, hi=None):
        lo = node.attrs.get("min", lo)
        hi = node.attrs.get("max", hi)
        if lo is not None:
            x = jnp.maximum(x, _np(lo) if _is_const(lo) else lo)
        if hi is not None:
            x = jnp.minimum(x, _np(hi) if _is_const(hi) else hi)
        return x

    def _binary(self, op, a, b):
        if _is_const(a) and _is_const(b):
            return getattr(np, op)(_np(a), _np(b))
        return getattr(jnp, op)(a, b)

    def op_Add(self, node, a, b):
        return self._binary("add", a, b)

    def op_Sub(self, node, a, b):
        return self._binary("subtract", a, b)

    def op_Mul(self, node, a, b):
        return self._binary("multiply", a, b)

    def op_Div(self, node, a, b):
        if _is_const(a) and _is_const(b):
            a_np, b_np = _np(a), _np(b)
            if np.issubdtype(a_np.dtype, np.integer) and np.issubdtype(b_np.dtype, np.integer):
                # ONNX integer Div truncates toward zero (C semantics);
                # Python // floors, which differs for negative operands.
                return (np.sign(a_np) * np.sign(b_np)
                        * (np.abs(a_np) // np.abs(b_np))).astype(a_np.dtype)
            return a_np / b_np
        return jnp.divide(a, b)

    def op_Pow(self, node, a, b):
        return self._binary("power", a, b)

    def op_Equal(self, node, a, b):
        return self._binary("equal", a, b)

    def op_Greater(self, node, a, b):
        return self._binary("greater", a, b)

    def op_Less(self, node, a, b):
        return self._binary("less", a, b)

    def op_Where(self, node, cond, a, b):
        return jnp.where(cond, a, b)

    def op_Max(self, node, *xs):
        out = xs[0]
        for x in xs[1:]:
            out = jnp.maximum(out, x)
        return out

    def op_Min(self, node, *xs):
        out = xs[0]
        for x in xs[1:]:
            out = jnp.minimum(out, x)
        return out

    # -- normalisation -----------------------------------------------------

    def op_BatchNormalization(self, node, x, scale, bias, mean, var):
        eps = node.attrs.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = jax.lax.rsqrt(jnp.asarray(var, x.dtype) + eps).reshape(shape)
        return (x - jnp.asarray(mean, x.dtype).reshape(shape)) * inv \
            * jnp.asarray(scale, x.dtype).reshape(shape) \
            + jnp.asarray(bias, x.dtype).reshape(shape)

    def op_InstanceNormalization(self, node, x, scale, bias):
        eps = node.attrs.get("epsilon", 1e-5)
        axes = tuple(range(2, x.ndim))
        # Statistics in f32 even under bf16 autocast: 8-bit-mantissa mean/var
        # over large spatial extents degrades the normalisation (same policy
        # as models/tfc_tdf.py's norm layers).
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.var(x32, axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        out = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
        return out * jnp.asarray(scale, x.dtype).reshape(shape) \
            + jnp.asarray(bias, x.dtype).reshape(shape)

    def op_GroupNormalization(self, node, x, scale, bias):
        eps = node.attrs.get("epsilon", 1e-5)
        groups = int(node.attrs["num_groups"])
        n, c = x.shape[:2]
        spatial = x.shape[2:]
        xg = x.reshape(n, groups, c // groups, *spatial)
        axes = tuple(range(2, xg.ndim))
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        out = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return out * jnp.asarray(scale, x.dtype).reshape(shape) \
            + jnp.asarray(bias, x.dtype).reshape(shape)

    def op_LayerNormalization(self, node, x, scale, bias=None):
        eps = node.attrs.get("epsilon", 1e-5)
        axis = node.attrs.get("axis", -1)
        axes = tuple(range(axis % x.ndim, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + eps) * scale
        if bias is not None:
            out = out + bias
        return out

    def op_ReduceMean(self, node, x, axes=None):
        axes = node.attrs.get("axes", axes)
        keepdims = bool(node.attrs.get("keepdims", 1))
        axes_t = tuple(int(a) for a in _np(axes).reshape(-1)) if axes is not None else None
        return jnp.mean(x, axis=axes_t, keepdims=keepdims)

    def op_ReduceSum(self, node, x, axes=None):
        axes = node.attrs.get("axes", axes)
        keepdims = bool(node.attrs.get("keepdims", 1))
        axes_t = tuple(int(a) for a in _np(axes).reshape(-1)) if axes is not None else None
        return jnp.sum(x, axis=axes_t, keepdims=keepdims)

    # -- conv / pool -------------------------------------------------------

    def op_Conv(self, node, x, w, b=None):
        rank = x.ndim - 2
        strides = node.attrs.get("strides", [1] * rank)
        dilations = node.attrs.get("dilations", [1] * rank)
        group = int(node.attrs.get("group", 1))
        auto_pad = node.attrs.get("auto_pad", "NOTSET")
        kernel_spatial = self._shape_of(w)[2:]
        if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
            pads = []
            for i in range(rank):
                out_dim = -(-x.shape[2 + i] // strides[i])
                total = max(0, (out_dim - 1) * strides[i]
                            + (kernel_spatial[i] - 1) * dilations[i] + 1 - x.shape[2 + i])
                lo = total // 2 if auto_pad == "SAME_UPPER" else (total + 1) // 2
                pads.append((lo, total - lo))
        else:
            pads = _pair_pads(node.attrs.get("pads", [0] * 2 * rank), rank)
        dn = ("NCHW", "OIHW", "NCHW") if rank == 2 else (
            ("NCW", "OIW", "NCW") if rank == 1 else ("NCDHW", "OIDHW", "NCDHW"))
        out = jax.lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype),
            window_strides=[int(s) for s in strides],
            padding=pads,
            rhs_dilation=[int(d) for d in dilations],
            dimension_numbers=dn,
            feature_group_count=group,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if b is not None:
            out = out + jnp.asarray(b, x.dtype).reshape((1, -1) + (1,) * rank)
        return out

    def op_ConvTranspose(self, node, x, w, b=None):
        rank = x.ndim - 2
        strides = [int(s) for s in node.attrs.get("strides", [1] * rank)]
        dilations = [int(d) for d in node.attrs.get("dilations", [1] * rank)]
        group = int(node.attrs.get("group", 1))
        out_padding = [int(p) for p in node.attrs.get("output_padding", [0] * rank)]
        pads = _pair_pads(node.attrs.get("pads", [0] * 2 * rank), rank)
        w_np = jnp.asarray(w, x.dtype)
        # ONNX ConvTranspose weight: (C_in, C_out/group, *k). Flip spatially and
        # swap to (C_out, C_in/group, *k) so a regular dilated conv implements it.
        kernel_spatial = tuple(self._shape_of(w)[2:])
        flip_axes = tuple(range(2, 2 + rank))
        w_flipped = jnp.flip(w_np, axis=flip_axes)
        if group == 1:
            w_oi = jnp.swapaxes(w_flipped, 0, 1)
        else:
            cin, cog = self._shape_of(w)[0], self._shape_of(w)[1]
            wg = w_flipped.reshape(group, cin // group, cog, *kernel_spatial)
            w_oi = jnp.swapaxes(wg, 1, 2).reshape(group * cog, cin // group, *kernel_spatial)
        conv_pads = []
        for i in range(rank):
            eff_k = dilations[i] * (kernel_spatial[i] - 1)
            conv_pads.append((eff_k - pads[i][0], eff_k - pads[i][1] + out_padding[i]))
        dn = ("NCHW", "OIHW", "NCHW") if rank == 2 else (
            ("NCW", "OIW", "NCW") if rank == 1 else ("NCDHW", "OIDHW", "NCDHW"))
        out = jax.lax.conv_general_dilated(
            x, w_oi,
            window_strides=[1] * rank,
            padding=conv_pads,
            lhs_dilation=strides,
            rhs_dilation=dilations,
            dimension_numbers=dn,
            feature_group_count=group,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if b is not None:
            out = out + jnp.asarray(b, x.dtype).reshape((1, -1) + (1,) * rank)
        return out

    def _pool(self, node, x, reducer, init, is_avg=False):
        rank = x.ndim - 2
        kernel = [int(k) for k in node.attrs["kernel_shape"]]
        strides = [int(s) for s in node.attrs.get("strides", [1] * rank)]
        pads = _pair_pads(node.attrs.get("pads", [0] * 2 * rank), rank)
        window = (1, 1) + tuple(kernel)
        strides_full = (1, 1) + tuple(strides)
        pads_full = [(0, 0), (0, 0)] + pads
        out = jax.lax.reduce_window(x, init, reducer, window, strides_full, pads_full)
        if is_avg:
            ones = jnp.ones_like(x)
            counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides_full, pads_full)
            if not node.attrs.get("count_include_pad", 0):
                out = out / counts
            else:
                out = out / float(np.prod(kernel))
        return out

    def op_MaxPool(self, node, x):
        return self._pool(node, x, jax.lax.max, -jnp.inf)

    def op_AveragePool(self, node, x):
        return self._pool(node, x, jax.lax.add, 0.0, is_avg=True)

    def op_GlobalAveragePool(self, node, x):
        return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    # -- linear ------------------------------------------------------------

    def op_MatMul(self, node, a, b):
        return jnp.matmul(a, jnp.asarray(b, getattr(a, "dtype", jnp.float32)),
                          preferred_element_type=jnp.float32).astype(
                              getattr(a, "dtype", jnp.float32))

    def op_Gemm(self, node, a, b, c=None):
        alpha = node.attrs.get("alpha", 1.0)
        beta = node.attrs.get("beta", 1.0)
        if node.attrs.get("transA", 0):
            a = jnp.swapaxes(a, -1, -2)
        if node.attrs.get("transB", 0):
            b = jnp.swapaxes(jnp.asarray(b), -1, -2)
        out = alpha * jnp.matmul(a, jnp.asarray(b, getattr(a, "dtype", jnp.float32)),
                                 preferred_element_type=jnp.float32)
        if c is not None:
            out = out + beta * jnp.asarray(c)
        return out.astype(getattr(a, "dtype", jnp.float32))

    # -- shape machinery (constant-folded where possible) ------------------

    def op_Shape(self, node, x):
        shape = np.asarray(self._shape_of(x), dtype=np.int64)
        start = node.attrs.get("start", 0)
        end = node.attrs.get("end", len(shape))
        return shape[start:end]

    def op_Size(self, node, x):
        return np.asarray(int(np.prod(self._shape_of(x))), dtype=np.int64)

    def op_Constant(self, node):
        for key in ("value", "value_float", "value_int", "value_floats", "value_ints"):
            if key in node.attrs:
                return _np(node.attrs[key])
        raise ValueError("Constant node without value")

    def op_ConstantOfShape(self, node, shape):
        value = node.attrs.get("value", np.zeros(1, dtype=np.float32))
        value = _np(value)
        return np.full(tuple(int(s) for s in _np(shape)), value.reshape(-1)[0],
                       dtype=value.dtype)

    def op_Cast(self, node, x):
        to = int(node.attrs["to"])
        if _is_const(x):
            np_map = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_,
                      10: np.float16, 11: np.float64}
            return _np(x).astype(np_map.get(to, np.float32))
        return x.astype(_DTYPE_MAP.get(to, jnp.float32))

    def op_Identity(self, node, x):
        return x

    def op_Dropout(self, node, x, *rest):
        return x

    def op_Reshape(self, node, x, shape=None):
        target = node.attrs.get("shape", shape)
        target = [int(s) for s in _np(target).reshape(-1)]
        cur = self._shape_of(x)
        resolved = [cur[i] if s == 0 and node.attrs.get("allowzero", 0) == 0 else s
                    for i, s in enumerate(target)]
        if _is_const(x):
            return _np(x).reshape(resolved)
        return x.reshape(resolved)

    def op_Flatten(self, node, x):
        axis = node.attrs.get("axis", 1)
        shape = self._shape_of(x)
        if axis < 0:  # opset 11+: negative axis counts from the end
            axis += len(shape)
        lead = int(np.prod(shape[:axis])) if axis > 0 else 1
        return x.reshape(lead, -1)

    def op_Transpose(self, node, x):
        perm = node.attrs.get("perm")
        if perm is None:
            perm = list(range(x.ndim))[::-1]
        if _is_const(x):
            return _np(x).transpose(perm)
        return x.transpose(perm)

    def op_Unsqueeze(self, node, x, axes=None):
        axes = node.attrs.get("axes", axes)
        axes = sorted(int(a) for a in _np(axes).reshape(-1))
        for a in axes:
            x = np.expand_dims(x, a) if _is_const(x) else jnp.expand_dims(x, a)
        return x

    def op_Squeeze(self, node, x, axes=None):
        axes = node.attrs.get("axes", axes)
        if axes is None:
            axes_t = tuple(i for i, s in enumerate(self._shape_of(x)) if s == 1)
        else:
            axes_t = tuple(int(a) for a in _np(axes).reshape(-1))
        if _is_const(x):
            return np.squeeze(_np(x), axis=axes_t)
        return jnp.squeeze(x, axis=axes_t)

    def op_Concat(self, node, *xs):
        axis = int(node.attrs["axis"])
        if all(_is_const(x) for x in xs):
            return np.concatenate([_np(x) for x in xs], axis=axis)
        return jnp.concatenate(xs, axis=axis)

    def op_Gather(self, node, x, indices):
        axis = int(node.attrs.get("axis", 0))
        if _is_const(x) and _is_const(indices):
            return np.take(_np(x), _np(indices).astype(np.int64), axis=axis)
        return jnp.take(x, jnp.asarray(_np(indices)) if _is_const(indices) else indices,
                        axis=axis)

    def op_Slice(self, node, x, starts=None, ends=None, axes=None, steps=None):
        # opset < 10 uses attributes
        starts = node.attrs.get("starts", starts)
        ends = node.attrs.get("ends", ends)
        axes = node.attrs.get("axes", axes)
        steps = steps if steps is not None else node.attrs.get("steps")
        starts = [int(v) for v in _np(starts).reshape(-1)]
        ends = [int(v) for v in _np(ends).reshape(-1)]
        axes = ([int(v) for v in _np(axes).reshape(-1)] if axes is not None
                else list(range(len(starts))))
        steps = ([int(v) for v in _np(steps).reshape(-1)] if steps is not None
                 else [1] * len(starts))
        slices = [slice(None)] * (len(self._shape_of(x)))
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            # clamp ONNX INT64_MAX-style sentinels
            en = None if en >= (1 << 62) else en
            slices[ax] = slice(st, en, sp)
        return _np(x)[tuple(slices)] if _is_const(x) else x[tuple(slices)]

    def op_Split(self, node, x, split=None):
        axis = int(node.attrs.get("axis", 0))
        split = node.attrs.get("split", split)
        size = self._shape_of(x)[axis]
        if split is None:
            num = len(node.outputs)
            part = size // num
            split = [part] * num
        else:
            split = [int(s) for s in _np(split).reshape(-1)]
        bounds = np.cumsum(split)[:-1]
        return jnp.split(x, bounds, axis=axis)

    def op_Pad(self, node, x, pads=None, value=None, axes=None):
        mode = node.attrs.get("mode", "constant")
        pads = node.attrs.get("pads", pads)
        pads = [int(p) for p in _np(pads).reshape(-1)]
        rank = x.ndim
        if axes is not None:
            axes_l = [int(a) % rank for a in _np(axes).reshape(-1)]
        else:
            axes_l = list(range(rank))
        pad_width = [(0, 0)] * rank
        half = len(pads) // 2
        for i, ax in enumerate(axes_l):
            pad_width[ax] = (pads[i], pads[i + half])
        if mode == "constant":
            cval = float(_np(value).reshape(-1)[0]) if value is not None else \
                float(node.attrs.get("value", 0.0))
            return jnp.pad(x, pad_width, constant_values=cval)
        jax_mode = {"reflect": "reflect", "edge": "edge", "wrap": "wrap"}[mode]
        return jnp.pad(x, pad_width, mode=jax_mode)

    def op_Expand(self, node, x, shape):
        target = [int(s) for s in _np(shape).reshape(-1)]
        cur = list(self._shape_of(x))
        # ONNX Expand uses numpy broadcasting; -1/1 handling
        while len(cur) < len(target):
            cur.insert(0, 1)
        out_shape = [max(c, t) if t != 1 else c for c, t in zip(cur, target)]
        return jnp.broadcast_to(x.reshape(cur), out_shape)

    def op_Tile(self, node, x, repeats):
        reps = [int(r) for r in _np(repeats).reshape(-1)]
        return jnp.tile(x, reps)

    def op_Range(self, node, start, limit, delta):
        # dtype follows the inputs (ONNX spec); int() coercion would corrupt
        # float ranges (e.g. positional encodings with fractional deltas).
        s0, l0, d0 = (_np(start).reshape(()), _np(limit).reshape(()),
                      _np(delta).reshape(()))
        return np.arange(s0, l0, d0, dtype=np.result_type(s0, l0, d0))

    def op_Resize(self, node, x, roi=None, scales=None, sizes=None):
        mode = node.attrs.get("mode", "nearest")
        coord = node.attrs.get("coordinate_transformation_mode", "half_pixel")
        # jax.image.resize implements half-pixel sampling; pytorch_half_pixel
        # only differs when an output dim is 1, and asymmetric matches for
        # nearest upsampling by integral factors (the Conv-TDF decoder
        # pattern). Anything else would silently shift feature maps.
        if coord not in ("half_pixel", "pytorch_half_pixel", "asymmetric"):
            raise NotImplementedError(
                f"Resize coordinate_transformation_mode={coord!r} not supported")
        in_shape = self._shape_of(x)
        if sizes is not None:
            out_shape = [int(s) for s in _np(sizes).reshape(-1)]
        else:
            sc = _np(scales).reshape(-1)
            # ONNX mandates floor(dim * scale) for scale-derived sizes.
            out_shape = [int(np.floor(d * s)) for d, s in zip(in_shape, sc)]
        method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}[mode]
        return jax.image.resize(x, out_shape, method=method)


@functools.lru_cache(maxsize=32)
def _load_converted(path: str):
    model = load_model(path)
    conv = OnnxToJax(model)
    return conv


def onnx_to_jax(path: str):
    """Load an .onnx file → (fn, params, input_names, output_names)."""
    conv = _load_converted(path)
    return conv.make_fn(), conv.params, conv.input_names, conv.output_names
