"""Spatio-Temporal DeepKriging (STDK) — adds a 1D temporal Wendland basis.

Reference ``p2igan_bench/models/stdk.py``. Per-(t, pixel) features are
``[phi_s(K_s) | phi_t(K_t) | z_seq(T*79)]`` through the shared MLP. The
reference materializes the full (B, T, HW, K_s+K_t+T*79) tensor
(stdk.py:165-184); here the first layer is decomposed —

    h1 = phi_s @ W_s  (pixel part, shared by all b,t)
       + phi_t @ W_t  (frame part, shared by all b,pixels)
       + z_seq @ W_z  (sample part, shared by all t,pixels)  + b1

— three small matmuls plus a broadcast add, then the MLP tail runs per frame
under ``lax.scan``. Identical math, none of the expanded feature tensor.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.wendland import build_phi_space, build_phi_time, time_basis_count
from .dk import DKMLP, resolve_sample_length, select_visible


class STDKGenerator(nn.Module):
    """masked/masks: (B, T, H, W, C) -> preds (B, T, H, W, C); C must be 1."""

    length: int = 16
    visible_k: int = 79
    num_basis_space: Tuple[int, ...] = (10, 19, 37, 73)
    num_basis_time: Tuple[int, ...] = (10, 19, 37, 73)
    compute_dtype: Any = jnp.float32
    # Fused VMEM tail, differentiable since round 5; ``None`` = auto
    # (see models/dk.py / ops/pallas/dk_mlp_kernel)
    fused_tail: bool | None = None
    # Gauge workload declaration (see models/dk.py::select_visible)
    shared_batch_mask: bool = False

    @classmethod
    def from_config(cls, config: Dict[str, Any], length: int | None = None,
                    **kw) -> "STDKGenerator":
        from .dk import _train_mask_is_stis

        kw.setdefault("shared_batch_mask", _train_mask_is_stis(config))
        return cls(length=resolve_sample_length(config, length), **kw)

    def fold_for_inference(self, variables):
        return self.clone(fused_tail=True), variables

    @nn.compact
    def __call__(self, masked_frames: jax.Array, masks: jax.Array) -> jax.Array:
        b, t, h, w, c = masked_frames.shape
        if t != self.length:
            raise ValueError(f"expected T == {self.length}, got {t}")
        if c != 1:
            raise ValueError(f"DK/STDK expect single-channel frames, got C={c}")
        HW = h * w
        K_s = sum(self.num_basis_space)
        K_t = time_basis_count(self.length, tuple(self.num_basis_time))

        phi_s = jnp.asarray(build_phi_space(h, w, tuple(self.num_basis_space)))
        phi_t = jnp.asarray(build_phi_time(t, tuple(self.num_basis_time)))
        phi_s = phi_s.astype(self.compute_dtype)
        phi_t = phi_t.astype(self.compute_dtype)

        x_flat = masked_frames[..., 0].reshape(b, t, HW).astype(self.compute_dtype)
        m_flat = masks[..., 0].reshape(b, t, HW).astype(jnp.float32)
        z = select_visible(x_flat, m_flat, self.visible_k,
                           self.shared_batch_mask)  # (B, T, k)
        z_seq = z.reshape(b, t * self.visible_k)

        feature_dim = K_s + K_t + t * self.visible_k
        mlp = DKMLP(feature_dim=feature_dim, name="mlp")
        w_s = mlp.fc1[:K_s]
        w_t = mlp.fc1[K_s:K_s + K_t]
        w_z = mlp.fc1[K_s + K_t:]

        from ..ops.idw import default_use_pallas
        fused = (default_use_pallas(None) if self.fused_tail is None
                 else self.fused_tail)
        if fused:
            from ..ops.pallas.dk_mlp_kernel import (mlp_tail_fused,
                                                    mlp_tail_fused_padded,
                                                    pad_hidden,
                                                    pad_tail_weights)

            hid = mlp.hidden_dim
            if not default_use_pallas(None):
                phi_s_part = phi_s @ w_s
                offs = (((z_seq @ w_z + mlp.b1[0])[:, None, :]
                         + (phi_t @ w_t)[None, :, :])).reshape(b * t, hid)
                y = mlp_tail_fused(phi_s_part, offs, mlp.fc2, mlp.b2[0],
                                   mlp.fc3, mlp.b3[0], mlp.fc4[:, 0],
                                   mlp.b4[0, 0], use_pallas=False)
                return y.reshape(b, t, h, w, 1).astype(jnp.float32)
            # lane-aligned activations via padded first-layer weight columns
            # (see models/dk.py)
            Hp = pad_hidden(hid)
            w_s_p = jnp.pad(w_s, ((0, 0), (0, Hp - hid)))
            w_t_p = jnp.pad(w_t, ((0, 0), (0, Hp - hid)))
            w_z_p = jnp.pad(w_z, ((0, 0), (0, Hp - hid)))
            b1_p = jnp.pad(mlp.b1[0], (0, Hp - hid))
            phi_p = phi_s @ w_s_p                        # (HW, Hp)
            off_p = ((z_seq @ w_z_p + b1_p)[:, None, :]
                     + (phi_t @ w_t_p)[None, :, :]).reshape(b * t, Hp)
            y = mlp_tail_fused_padded(
                phi_p, off_p, *pad_tail_weights(mlp.fc2, mlp.b2[0],
                                                mlp.fc3, mlp.b3[0],
                                                mlp.fc4[:, 0], mlp.b4[0, 0]),
                cost_hidden=hid)
            return y.reshape(b, t, h, w, 1).astype(jnp.float32)

        phi_s_part = phi_s @ w_s                    # (HW, hidden)
        phi_t_part = phi_t @ w_t                    # (T, hidden)
        z_part = z_seq @ w_z + mlp.b1[0]            # (B, hidden)

        def frame(carry, t_part):  # t_part: (hidden,)
            h1 = phi_s_part[None] + (z_part + t_part)[:, None, :]  # (B, HW, hidden)
            y = mlp.tail(h1)[..., 0]
            return carry, y

        _, ys = jax.lax.scan(frame, None, phi_t_part)  # (T, B, HW)
        out = jnp.swapaxes(ys, 0, 1).reshape(b, t, h, w, 1)
        return out.astype(jnp.float32)


# Reference alias (stdk.py:279)
InpaintGenerator = STDKGenerator
