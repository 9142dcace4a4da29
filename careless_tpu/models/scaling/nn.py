"""MLP scaling model: metadata -> Normal distribution over scale factors.

Reference behavior: /root/reference/careless/models/scaling/nn.py. Key
optimization-dynamics details preserved exactly (SURVEY.md §7 hard part 4):
identity kernel initialization for every dense layer (nn.py:66), LeakyReLU
(0.01), final linear layer to (loc, scale-pre-bijector), softplus-or-exp
scale bijector shifted by epsilon, optional additive scale_multiplier shift
of the output distribution (istd, manager.py:476-489 — note the reference's
"multiplier" is implemented as a Shift bijector; we match the code).

TPU notes: the MLP is the main MXU workload of the ELBO step — a stack of
(N, w) x (w, w) matmuls. Parameters are plain pytrees; `apply` is pure.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.distributions import Normal
from ..base import Inputs


def _identity_kernel(d_in: int, d_out: int) -> np.ndarray:
    return np.eye(d_in, d_out, dtype=np.float32)


@dataclass(frozen=True)
class MLPScaler:
    """Static config; parameters live in the pytree returned by init().

    TPU layout optimization (`pack`): the reference-default width-10 matmuls
    occupy <1% of the 128x128 MXU. With pack=G > 1, G observations' feature
    vectors are concatenated along the contraction axis and the weight is
    expanded block-diagonally (kron(I_G, W)), so one (N/G, G*d) x (G*d, G*w)
    matmul computes G independent width-d matmuls at ~G x the MXU
    utilization. Pure layout change: parameters, math, and gradients are
    identical to the unpacked form. pack=0 auto-selects ~128/width.
    """

    n_layers: int
    width: int
    leakiness: float = 0.01
    epsilon: float = 1e-7
    scale_bijector: str = "softplus"  # 'softplus' | 'exp'
    scale_multiplier: Optional[float] = None
    pack: int = 0  # 0 = auto, 1 = off, G > 1 = explicit group size
    # single-pallas-kernel trunk (ops/fused_mlp.py): one kernel per
    # direction instead of ~3*n_layers tiny XLA matmul dispatches
    fused: bool = True
    # trunk matmul precision: 'float32' (reference-exact) or 'bfloat16'
    # (bf16 MXU operands with f32 accumulation, ~4x the f32 matmul rate;
    # parameters and all non-matmul math stay f32). CLI: --mlp-dtype.
    mlp_dtype: str = "float32"

    def init(self, key, metadata_dim: int) -> dict:
        del key  # deterministic identity init, matching the reference
        layers = []
        d = metadata_dim
        for _ in range(self.n_layers):
            layers.append({
                "w": jnp.asarray(_identity_kernel(d, self.width)),
                "b": jnp.zeros(self.width, jnp.float32),
            })
            d = self.width
        out = {"w": jnp.asarray(_identity_kernel(d, 2)),
               "b": jnp.zeros(2, jnp.float32)}
        return {"layers": layers, "out": out}

    def _biject_scale(self, raw):
        if self.scale_bijector == "softplus":
            return jax.nn.softplus(raw) + self.epsilon
        if self.scale_bijector == "exp":
            return jnp.exp(raw) + self.epsilon
        raise ValueError(f"Unsupported scale bijector type, {self.scale_bijector}")

    def _pack_group(self, metadata_dim: int) -> int:
        if self.pack == 1:
            return 1
        if self.pack > 1:
            return self.pack
        g = max(1, 128 // max(metadata_dim, self.width))
        return g

    def _mm(self, a, b):
        """Trunk matmul honoring mlp_dtype on every path (bf16 operands with
        f32 accumulation when requested — not only in the fused kernel)."""
        if self.mlp_dtype == "bfloat16":
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def network(self, params: dict, x, packed=None):
        if self.fused and x.ndim == 2 and self.n_layers >= 2:
            from ...ops.fused_mlp import fused_mlp_trunk
            return fused_mlp_trunk(x, params["layers"], self.leakiness,
                                   bf16=self.mlp_dtype == "bfloat16",
                                   packed=packed)
        g = self._pack_group(x.shape[-1])
        if g == 1 or x.ndim != 2:
            for layer in params["layers"]:
                x = self._mm(x, layer["w"])
                x = jax.nn.leaky_relu(x + layer["b"], self.leakiness)
            return x
        n = x.shape[0]
        n_pad = (-n) % g
        if n_pad:
            x = jnp.concatenate(
                [x, jnp.zeros((n_pad, x.shape[1]), x.dtype)], axis=0)
        eye_g = jnp.eye(g, dtype=jnp.float32)

        def block_diag(w):
            # kron(I_g, w) without jnp.kron's nested jit (which trips an
            # MLIR lowering-cache bug under pallas_call + custom_vjp)
            d_in, d_out = w.shape
            return (eye_g[:, None, :, None] * w[None, :, None, :]
                    ).reshape(g * d_in, g * d_out)

        x = x.reshape(-1, g * x.shape[1])
        for layer in params["layers"]:
            w_bd = block_diag(layer["w"])               # (g*d, g*w)
            b_t = jnp.tile(layer["b"], g)
            x = self._mm(x, w_bd)
            x = jax.nn.leaky_relu(x + b_t, self.leakiness)
        x = x.reshape(-1, self.width)
        return x[:n] if n_pad else x

    def head(self, params: dict, x) -> Normal:
        y = jnp.dot(x, params["out"]["w"],
                    preferred_element_type=jnp.float32) + params["out"]["b"]
        loc, raw_scale = y[..., 0], y[..., 1]
        scale = self._biject_scale(raw_scale)
        if self.scale_multiplier is not None:
            loc = loc + self.scale_multiplier
        return Normal(loc, scale)

    def apply(self, params: dict, inputs: Inputs) -> Normal:
        packed = inputs.plans.meta if inputs.plans is not None else None
        x = inputs.metadata
        if (self.fused and x.ndim == 2 and self.n_layers >= 2
                and max(x.shape[-1], self.width) >= 2):
            # trunk + head in one kernel, flat (N,) outputs — avoids the
            # lane-padded (N, width) intermediate (ops/fused_mlp.py)
            from ...ops.fused_mlp import fused_mlp_trunk_head
            loc, raw = fused_mlp_trunk_head(
                x, params["layers"], params["out"], self.leakiness,
                bf16=self.mlp_dtype == "bfloat16", packed=packed)
            scale = self._biject_scale(raw)
            if self.scale_multiplier is not None:
                loc = loc + self.scale_multiplier
            return Normal(loc, scale)
        return self.head(
            params, self.network(params, inputs.metadata, packed=packed))
