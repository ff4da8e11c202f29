"""Unified multi-head attention variants (A/B/C/D/E), TPU-native.

Functional parity with reference ``mop/models/attention_variants.py``:

- A: Baseline MSA (standard scaled dot-product attention)
- B: MoP-compatible (baseline attention; MoP gating applied outside attention)
- C: Cross-View Mixer (2-view binding + transpose cues + optional per-key prior)
- D: Multi-Hop dual-path attention with value-aware transport
- E: Edgewise-gated attention with per-edge gates from a small conv head;
  supports shared-QKV, multi-views, and Q/K + S-channel lens banks (the
  superset found in reference ``experiments/cifar100_edgewise_gates.py:377``)

The score algebra lives in ``mop_tpu.ops.attention``; these modules own the
parameters and orchestrate. Layouts are chosen for TPU (NHWC conv features,
einsum attention with fp32 accumulation).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import attention as A
from ..ops import fused as F
from ..config import (
    use_fused_attention,
    use_fused_edgewise_train,
    use_fused_multihop,
)
from .layers import (
    Conv,
    Conv1d,
    LayerNorm,
    Linear,
    fan_in_bias_init,
    gelu_tanh,
    torch_kaiming_uniform,
)

Array = jax.Array


def _split_heads(x: Array, h: int) -> Array:
    """(B, N, D) -> (B, H, N, dk)."""
    b, n, d = x.shape
    return x.reshape(b, n, h, d // h).transpose(0, 2, 1, 3)


def _merge_heads(y: Array) -> Array:
    """(B, H, N, dk) -> (B, N, D)."""
    b, h, n, dk = y.shape
    return y.transpose(0, 2, 1, 3).reshape(b, n, h * dk)


def _qkv(x: Array, h: int, lin: nn.Module) -> Tuple[Array, Array, Array]:
    """Fused bias-free QKV projection split into (B,H,N,dk) triples."""
    b, n, d = x.shape
    qkv = lin(x).reshape(b, n, 3, h, d // h).transpose(2, 0, 3, 1, 4)
    return qkv[0], qkv[1], qkv[2]


class BaselineMSA(nn.Module):
    """Mode A/B: standard MSA (reference ``attention_variants.py:23-48``)."""

    dim: int
    heads: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(
        self, x: Array, attn_mask: Optional[Array] = None, train: bool = False
    ) -> Array:
        q, k, v = _qkv(x, self.heads, Linear(self.dim * 3, use_bias=False, name="qkv"))
        if (use_fused_attention() and attn_mask is None
                and (self.attn_drop == 0.0 or not train)):
            y = F.flash_attention(q, k, v, causal=False)
        else:
            s = A.scaled_scores(q, k)
            att = A.masked_softmax(s, attn_mask)
            att = nn.Dropout(self.attn_drop, deterministic=not train)(att)
            y = jnp.einsum("bhnm,bhmd->bhnd", att.astype(v.dtype), v)
        y = Linear(self.dim, use_bias=False, name="proj")(_merge_heads(y))
        return nn.Dropout(self.proj_drop, deterministic=not train)(y)


class CrossViewMixerMSA(nn.Module):
    """Mode C: cross-view binding with a learnable 2x2 mixer, transpose cues,
    and optional per-key prior sharpening (reference :51-156)."""

    dim: int
    heads: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_transpose_cues: bool = True
    t1: float = 0.0
    t2: float = 0.0
    enable_per_key_prior: bool = False
    prior_weight: float = 0.5
    anchor_mode: str = "argmax_row_sum"
    fixed_k_star: int = 0

    @nn.compact
    def __call__(
        self, x: Array, attn_mask: Optional[Array] = None, train: bool = False
    ) -> Array:
        h = self.heads
        q1, k1, v1 = _qkv(x, h, Linear(self.dim * 3, use_bias=False, name="qkv1"))
        q2, k2, _ = _qkv(x, h, Linear(self.dim * 3, use_bias=False, name="qkv2"))
        s1 = A.scaled_scores(q1, k1)
        s2 = A.scaled_scores(q2, k2)
        s12 = A.scaled_scores(q1, k2)
        s21 = A.scaled_scores(q2, k1)
        mix = self.param("mix", lambda k, s: jnp.eye(2, dtype=jnp.float32), (2, 2))
        s = mix[0, 0] * s1 + mix[0, 1] * s12 + mix[1, 0] * s21 + mix[1, 1] * s2
        if self.use_transpose_cues:
            if self.t1 != 0.0:
                s = s + self.t1 * jnp.swapaxes(s1, -2, -1)
            if self.t2 != 0.0:
                s = s + self.t2 * jnp.swapaxes(s2, -2, -1)
        a_mix = A.masked_softmax(s, attn_mask)
        if self.enable_per_key_prior and self.prior_weight > 0.0:
            a1 = A.masked_softmax(s1, attn_mask)
            a2 = A.masked_softmax(s2, attn_mask)
            b, hh, n, _ = a2.shape
            if self.anchor_mode == "fixed":
                k_star = jnp.full((b, hh), max(0, min(n - 1, self.fixed_k_star)), jnp.int32)
            elif self.anchor_mode == "argmax_row_sum":
                row_sum = jnp.sum(a2, axis=-1)  # (B,H,N)
                k_star = jnp.argmax(row_sum, axis=-1).astype(jnp.int32)
            else:
                k_star = jnp.zeros((b, hh), jnp.int32)
            a2_anchor = jnp.take_along_axis(a2, k_star[:, :, None, None], axis=2)
            a_sharp = a1 * a2_anchor  # broadcast row k* over queries
            a_sharp = a_sharp / (jnp.sum(a_sharp, axis=-1, keepdims=True) + 1e-9)
            att = (1.0 - self.prior_weight) * a_mix + self.prior_weight * a_sharp
        else:
            att = a_mix
        att = nn.Dropout(self.attn_drop, deterministic=not train)(att)
        y = jnp.einsum("bhnm,bhmd->bhnd", att.astype(v1.dtype), v1)
        y = Linear(self.dim, use_bias=False, name="proj")(_merge_heads(y))
        return nn.Dropout(self.proj_drop, deterministic=not train)(y)


class MultiHopMSA(nn.Module):
    """Mode D: dual-path logits with gated multi-hop composition and
    value transport along the chain (reference :163-231)."""

    dim: int
    heads: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    beta_not: float = 0.5
    gates: Optional[Dict[str, float]] = None
    hops: int = 3

    @nn.compact
    def __call__(
        self, x: Array, attn_mask: Optional[Array] = None, train: bool = False
    ) -> Array:
        assert self.hops >= 2
        h = self.heads
        gates = self.gates or dict(and_=1.0, or_=0.0, not_=0.0, chain=0.0, base=1.0)
        q1, k1, v1 = _qkv(x, h, Linear(self.dim * 3, use_bias=False, name="qkv1"))
        q2, k2, v2 = _qkv(x, h, Linear(self.dim * 3, use_bias=False, name="qkv2"))
        w = jax.nn.sigmoid(
            self.param("chain_value_logit", lambda k, s: jnp.asarray(-2.0), ())
        )
        if use_fused_multihop() and attn_mask is None and not train:
            # One fused kernel: scores, softmaxes, chain, mix, value transport.
            # Inference-only: the custom-VJP recompute backward costs an extra
            # forward, which loses to XLA autodiff at training time (measured
            # on v5e: 28.0 vs 19.7 ms/step for the 5M ViTMultiHop).
            y = F.fused_multihop_attention(
                q1, k1, v1, q2, k2, v2,
                gates={**gates, "base": 1.0}, beta_not=self.beta_not,
                hops=self.hops, chain_w=w,
            )
        else:
            s1 = A.apply_mask(A.scaled_scores(q1, k1), attn_mask)
            s2 = A.apply_mask(A.scaled_scores(q2, k2), attn_mask)
            a1 = jax.nn.softmax(s1, axis=-1)
            a2 = jax.nn.softmax(s2, axis=-1)
            c_fwd = A.chain_product([a1] + [a2] * (self.hops - 1))
            smix = A.multihop_logit_mix(s1, s2, c_fwd, gates, self.beta_not)
            att = A.masked_softmax(smix, attn_mask)
            att = nn.Dropout(self.attn_drop, deterministic=not train)(att)
            # Value transport along the chain: A1 @ A2^(hops-1) @ v2
            transport = v2
            for _ in range(max(0, self.hops - 1)):
                transport = jnp.einsum(
                    "bhnm,bhmd->bhnd", a2.astype(v2.dtype), transport)
            y_chain = jnp.einsum("bhnm,bhmd->bhnd", a1.astype(v2.dtype), transport)
            y = jnp.einsum("bhnm,bhmd->bhnd", att.astype(v1.dtype), v1) + w * y_chain
        y = Linear(self.dim, use_bias=False, name="proj")(_merge_heads(y))
        return nn.Dropout(self.proj_drop, deterministic=not train)(y)


def _preset_block_bias(gate_init: str, gate_rank: int, total: int):
    """Low-rank bias preset: constant sqrt(2/r) on the preset's rank block
    (reference :280-309). Channel order: 0=and, 1=or, 2=not, 3=chain."""
    bias = jnp.zeros((total,), jnp.float32)
    idx_map = {"and": 0, "or": 1, "not": 2, "chain": 3, "nor": 2, "xor": 1}
    c = float(max(0.0, (2.0 / max(1, gate_rank)) ** 0.5))
    if gate_init in idx_map:
        i = idx_map[gate_init]
        bias = bias.at[i * gate_rank : (i + 1) * gate_rank].set(c)
    elif gate_init == "mix5":
        for i in (0, 1, 2):
            bias = bias.at[i * gate_rank : (i + 1) * gate_rank].set(c)
    return bias


def _dense_head_bias(gate_init: str):
    """Dense-head output bias preset: all -5 (gates ~off), preset channel +2
    (reference :257-272)."""
    bias = jnp.full((4,), -5.0, jnp.float32)
    idx_map = {"and": 0, "or": 1, "not": 2, "chain": 3, "nor": 2, "xor": 1}
    if gate_init in idx_map:
        bias = bias.at[idx_map[gate_init]].set(2.0)
    return bias


class EdgewiseGateHead(nn.Module):
    """Per-edge gate head over stacked score features (reference :234-331).

    Input ``feat`` is NHWC: (B*H, N, N, C). Returns gates (B*H, N, N, 4) in
    [0,1] with channel order (and, or, not, chain).
    """

    in_ch: int
    hidden: int = 16
    use_k3: bool = False
    gate_mode: str = "dense"
    gate_rank: int = 4
    gate_init: str = "neutral"

    def setup(self):
        if self.gate_mode == "dense":
            self.conv1 = Conv(self.hidden, (1, 1), use_bias=True)
            if self.use_k3:
                self.mid3 = Conv(self.hidden, (3, 3), padding=1, use_bias=True)
            kinit = torch_kaiming_uniform()
            self.conv2_kernel = self.param(
                "conv2_kernel", kinit, (1, 1, self.hidden, 4))
            self.conv2_bias = self.param(
                "conv2_bias", lambda k, s: _dense_head_bias(self.gate_init), (4,))
        else:
            r = self.gate_rank
            kinit = torch_kaiming_uniform()
            self.row_proj_kernel = self.param(
                "row_proj_kernel", kinit, (self.in_ch, 4 * r))
            self.row_proj_bias = self.param(
                "row_proj_bias",
                lambda k, s: _preset_block_bias(self.gate_init, r, 4 * r),
                (4 * r,))
            self.col_proj_kernel = self.param(
                "col_proj_kernel", kinit, (self.in_ch, 4 * r))
            self.col_proj_bias = self.param(
                "col_proj_bias",
                lambda k, s: _preset_block_bias(self.gate_init, r, 4 * r),
                (4 * r,))

    def lowrank_params(self):
        """(wrow, brow, wcol, bcol) — consumed by the fused Pallas kernel."""
        assert self.gate_mode != "dense"
        return (self.row_proj_kernel, self.row_proj_bias,
                self.col_proj_kernel, self.col_proj_bias)

    def dense_params(self):
        """(w1, b1, w2, b2, wk3, bk3) — the 1x1 convs as (C, hidden) /
        (hidden, 4) matmul kernels (+ the 3x3 mid conv if use_k3), consumed
        by the fused dense-gate Pallas kernel."""
        assert self.gate_mode == "dense"
        w1 = self.conv1.variables["params"]["kernel"][0, 0]
        b1 = self.conv1.variables["params"]["bias"]
        w2 = self.conv2_kernel[0, 0]
        b2 = self.conv2_bias
        if self.use_k3:
            wk3 = self.mid3.variables["params"]["kernel"]
            bk3 = self.mid3.variables["params"]["bias"]
            return w1, b1, w2, b2, wk3, bk3
        return w1, b1, w2, b2, None, None

    def __call__(self, feat: Array) -> Array:
        if self.gate_mode == "dense":
            x = self.conv1(feat)
            x = gelu_tanh(x)
            if self.use_k3:
                x = self.mid3(gelu_tanh(x))
            x = jnp.einsum("bnmc,co->bnmo", x, self.conv2_kernel[0, 0])
            return jax.nn.sigmoid(x + self.conv2_bias)
        # Low-rank: row/col mean-pooled features -> per-gate rank factors.
        r = self.gate_rank
        row_feat = jnp.mean(feat, axis=2)  # (BH, N, C)  — mean over keys j
        col_feat = jnp.mean(feat, axis=1)  # (BH, N, C)  — mean over queries i
        bh, n, _ = row_feat.shape
        a = (row_feat @ self.row_proj_kernel + self.row_proj_bias).reshape(bh, n, 4, r)
        b = (col_feat @ self.col_proj_kernel + self.col_proj_bias).reshape(bh, n, 4, r)
        # G[bh, i, j, c] = sum_r a[bh,i,c,r] * b[bh,j,c,r]
        g = jnp.einsum("bicr,bjcr->bijc", a, b)
        return jax.nn.sigmoid(g)


class EdgewiseMSA(nn.Module):
    """Mode E: edgewise-gated multi-view attention (reference :334-564, plus the
    lens-bank superset of ``experiments/cifar100_edgewise_gates.py``)."""

    dim: int
    heads: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    beta_not: float = 0.5
    use_k3: bool = False
    n_views: int = 2
    share_qkv: bool = False
    gate_mode: str = "dense"
    gate_rank: int = 4
    gate_init: str = "neutral"
    use_lens_bank: bool = False
    lens_kernel_size: int = 3
    lens_dilations: Optional[Tuple[int, ...]] = None
    use_lens_bank_qk: bool = False
    lens_qk_kernel_size: int = 3
    lens_qk_dilations: Optional[Tuple[int, ...]] = None
    lens_qk_causal: bool = False

    @nn.compact
    def __call__(
        self, x: Array, attn_mask: Optional[Array] = None, train: bool = False
    ) -> Array:
        b, n, d = x.shape
        h = self.heads
        dk = d // h
        n_views = max(2, int(self.n_views))
        lens_dil = tuple(self.lens_dilations) if self.lens_dilations else (1, 2)
        lens_qk_dil = tuple(self.lens_qk_dilations) if self.lens_qk_dilations else (1, 2)
        if self.use_lens_bank_qk and not self.share_qkv:
            raise ValueError("use_lens_bank_qk=True requires share_qkv=True for now")

        qs, ks, vs = [], [], []
        if self.share_qkv:
            qb, kb, vb = _qkv(x, h, Linear(d * 3, use_bias=False, name="qkv"))
            ones = nn.initializers.ones
            q_scale = self.param("q_scale", ones, (n_views, h, 1, dk))
            k_scale = self.param("k_scale", ones, (n_views, h, 1, dk))
            v_scale = self.param("v_scale", ones, (n_views, h, 1, dk))
            for i in range(n_views):
                qs.append(qb * q_scale[i])
                ks.append(kb * k_scale[i])
                vs.append(vb * v_scale[i])
        else:
            for i in range(n_views):
                qi, ki, vi = _qkv(x, h, Linear(d * 3, use_bias=False, name=f"qkv_{i}"))
                qs.append(qi)
                ks.append(ki)
                vs.append(vi)

        head = EdgewiseGateHead(
            in_ch=2 * (len(lens_qk_dil) if self.use_lens_bank_qk else n_views) + 2
            + ((len(lens_qk_dil) if self.use_lens_bank_qk else n_views)
               * len(lens_dil) if self.use_lens_bank else 0),
            hidden=16,
            use_k3=self.use_k3,
            gate_mode=self.gate_mode,
            gate_rank=self.gate_rank,
            gate_init=self.gate_init,
            name="edge_head",
        )

        w = jax.nn.sigmoid(
            self.param("chain_value_logit", lambda k, s: jnp.asarray(-2.0), ())
        )

        # Fully fused E-mode kernels: every score map, chain, gate head, mix,
        # softmax, and value product in VMEM. Training runs through the fused
        # backward kernel (in-kernel VJP; residuals and cotangents never
        # touch HBM). Requires attn_drop == 0 at train time (the fused path
        # has no attention-dropout site). Skipped during init so the dense
        # head's conv submodules still create their params.
        fused_ok = (
            use_fused_attention() and attn_mask is None
            and not self.use_lens_bank and not self.use_lens_bank_qk
            and not self.is_initializing()
            and (not train
                 or (use_fused_edgewise_train() and self.attn_drop == 0.0)))
        if fused_ok and self.gate_mode == "lowrank":
            wrow, brow, wcol, bcol = head.lowrank_params()
            y = F.fused_edgewise_lowrank_attention(
                jnp.stack(qs, axis=2), jnp.stack(ks, axis=2),
                jnp.stack(vs, axis=2), wrow, brow, wcol, bcol,
                beta_not=self.beta_not, chain_w=w,
            )
            if y is not None:
                y = Linear(d, use_bias=False, name="proj")(_merge_heads(y))
                return nn.Dropout(self.proj_drop, deterministic=not train)(y)
        # Dense head: fused at EVAL only. Re-measured after the bf16-MXU-
        # operand change (min-of-3 on v5e at the 5M config,
        # benchmarks/edgewise_train_kernel_dense.md): train step 113.2 vs
        # 67.2 ms — XLA still wins 1.68x because the scalar-weighted
        # gate-head sums are VPU-bound (matmul dtype was never the dense
        # kernel's bottleneck) and the backward doubles them.
        if fused_ok and self.gate_mode == "dense" and not train:
            w1, b1, w2, b2, wk3, bk3 = head.dense_params()
            y = F.fused_edgewise_dense_attention(
                jnp.stack(qs, axis=2), jnp.stack(ks, axis=2),
                jnp.stack(vs, axis=2), w1, b1, w2, b2,
                beta_not=self.beta_not, chain_w=w, wk3=wk3, bk3=bk3,
            )
            if y is not None:
                y = Linear(d, use_bias=False, name="proj")(_merge_heads(y))
                return nn.Dropout(self.proj_drop, deterministic=not train)(y)

        if self.use_lens_bank_qk:
            # Depthwise conv per dilation (reference :472-494). NOTE: the
            # reference flattens (B,H,N,D) with a RAW reshape to (B*H, D, N)
            # (:477-478) — not a transpose — so the conv axis interleaves
            # token and feature positions. We reproduce that exact semantics
            # (raw reshape, conv over the last axis, view back + transpose).
            ksz = self.lens_qk_kernel_size
            s_list = []
            q_scr = qs[0].reshape(b * h, dk, n)  # raw reshape, torch semantics
            k_scr = ks[0].reshape(b * h, dk, n)
            q_nlc = q_scr.transpose(0, 2, 1)  # NLC for the conv
            k_nlc = k_scr.transpose(0, 2, 1)
            for i, dil in enumerate(lens_qk_dil):
                if self.lens_qk_causal:
                    pad = ((ksz - 1) * dil, 0)
                else:
                    pad = dil * (ksz - 1) // 2
                q_l = Conv1d(
                    dk, ksz, padding=pad, dilation=dil, feature_group_count=dk,
                    use_bias=False, name=f"q_lens_{i}",
                )(q_nlc).transpose(0, 2, 1)  # back to (BH, dk, n) scrambled
                k_l = Conv1d(
                    dk, ksz, padding=pad, dilation=dil, feature_group_count=dk,
                    use_bias=False, name=f"k_lens_{i}",
                )(k_nlc).transpose(0, 2, 1)
                # view back as (B,H,D,N) then transpose -> (B,H,N,D) (:491-492)
                q_l = q_l.reshape(b, h, dk, n).transpose(0, 1, 3, 2)
                k_l = k_l.reshape(b, h, dk, n).transpose(0, 1, 3, 2)
                s_list.append(A.scaled_scores(q_l, k_l))
        else:
            s_list = [A.scaled_scores(qs[i], ks[i]) for i in range(n_views)]

        s_list = [A.apply_mask(s, attn_mask) for s in s_list]
        a_list = [jax.nn.softmax(s, axis=-1) for s in s_list]
        num_s = len(s_list)
        c_fwd = A.chain_product(a_list)
        c_bwd = A.chain_product(a_list[::-1])
        eps = 1e-6

        # Feature stack, NHWC over flattened (B*H): [S_i, S_i^T, logC_fwd, logC_bwd(, lens)]
        s_imgs = [s.reshape(b * h, n, n) for s in s_list]
        st_imgs = [jnp.swapaxes(s, 1, 2) for s in s_imgs]
        cr_img = jnp.log(c_fwd + eps).reshape(b * h, n, n)
        cl_img = jnp.log(c_bwd + eps).reshape(b * h, n, n)
        feat_list = s_imgs + st_imgs + [cr_img, cl_img]
        in_ch = 2 * num_s + 2
        if self.use_lens_bank:
            # Depthwise multi-dilation conv over stacked score maps (:427-442).
            # Cast to the compute dtype: scores are fp32-accumulated, but
            # lax.conv requires input/kernel dtypes to match (bf16 training).
            s_stack = jnp.stack(s_imgs, axis=-1).astype(x.dtype)  # (BH, N, N, V)
            for li, dil in enumerate(lens_dil):
                lensed = Conv(
                    num_s,
                    (self.lens_kernel_size, self.lens_kernel_size),
                    padding=dil,
                    dilation=(dil, dil),
                    feature_group_count=num_s,
                    use_bias=False,
                    name=f"lens_bank_{li}",
                )(s_stack)
                feat_list.extend(lensed[..., c] for c in range(num_s))
            in_ch += num_s * len(lens_dil)

        # Cast to the compute dtype: the dense head's convs require
        # input/kernel dtypes to match (fp32 scores vs bf16 params).
        feat = jnp.stack(feat_list, axis=-1).astype(x.dtype)  # (BH, N, N, C)
        assert head.in_ch == in_ch, (head.in_ch, in_ch)
        gates = head(feat)
        g_and, g_or, g_not, g_chain = (
            gates[..., 0],
            gates[..., 1],
            gates[..., 2],
            gates[..., 3],
        )
        smix = A.edgewise_logit_mix(
            s_imgs, g_and, g_or, g_not, g_chain, cr_img, self.beta_not
        ).reshape(b, h, n, n)
        att = A.masked_softmax(smix, attn_mask)
        att = nn.Dropout(self.attn_drop, deterministic=not train)(att)

        v1 = vs[0]
        y = jnp.einsum("bhnm,bhmd->bhnd", att.astype(v1.dtype), v1)
        # Value transport aligned with the constructed S views (:556-560).
        v_idx_last = min(len(vs) - 1, num_s - 1)
        transport = vs[v_idx_last]
        for i in range(num_s - 1, 0, -1):
            transport = jnp.einsum(
                "bhnm,bhmd->bhnd", a_list[i].astype(transport.dtype), transport
            )
        y_chain = jnp.einsum(
            "bhnm,bhmd->bhnd", a_list[0].astype(transport.dtype), transport
        )
        y = y + w * y_chain
        y = Linear(d, use_bias=False, name="proj")(_merge_heads(y))
        return nn.Dropout(self.proj_drop, deterministic=not train)(y)


class UnifiedMSA(nn.Module):
    """Switchable attention wrapper for modes A/B/C/D/E (reference :567-629)."""

    mode: str
    dim: int
    heads: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # C kwargs
    use_transpose_cues: bool = True
    t1: float = 0.0
    t2: float = 0.0
    enable_per_key_prior: bool = False
    prior_weight: float = 0.5
    anchor_mode: str = "argmax_row_sum"
    fixed_k_star: int = 0
    # D kwargs
    beta_not: float = 0.5
    gates: Optional[Dict[str, float]] = None
    hops: int = 3
    # E kwargs
    use_k3: bool = False
    n_views: int = 2
    share_qkv: bool = False
    gate_mode: str = "dense"
    gate_rank: int = 4
    gate_init: str = "neutral"
    # E lens-bank superset (passed through, unlike the reference UnifiedMSA
    # which drops them — ``attention_variants.py:609-622``; VERDICT r2 #8)
    use_lens_bank: bool = False
    lens_kernel_size: int = 3
    lens_dilations: Optional[Tuple[int, ...]] = None
    use_lens_bank_qk: bool = False
    lens_qk_kernel_size: int = 3
    lens_qk_dilations: Optional[Tuple[int, ...]] = None
    lens_qk_causal: bool = False

    @nn.compact
    def __call__(
        self, x: Array, attn_mask: Optional[Array] = None, train: bool = False
    ) -> Array:
        mode = str(self.mode).upper()
        if mode in ("A", "B"):
            impl = BaselineMSA(self.dim, self.heads, self.attn_drop, self.proj_drop, name="impl")
        elif mode == "C":
            impl = CrossViewMixerMSA(
                self.dim, self.heads, self.attn_drop, self.proj_drop,
                use_transpose_cues=self.use_transpose_cues, t1=self.t1, t2=self.t2,
                enable_per_key_prior=self.enable_per_key_prior,
                prior_weight=self.prior_weight, anchor_mode=self.anchor_mode,
                fixed_k_star=self.fixed_k_star, name="impl",
            )
        elif mode == "D":
            impl = MultiHopMSA(
                self.dim, self.heads, self.attn_drop, self.proj_drop,
                beta_not=self.beta_not, gates=self.gates, hops=self.hops, name="impl",
            )
        elif mode == "E":
            impl = EdgewiseMSA(
                self.dim, self.heads, self.attn_drop, self.proj_drop,
                beta_not=self.beta_not, use_k3=self.use_k3, n_views=self.n_views,
                share_qkv=self.share_qkv, gate_mode=self.gate_mode,
                gate_rank=self.gate_rank, gate_init=self.gate_init,
                use_lens_bank=self.use_lens_bank,
                lens_kernel_size=self.lens_kernel_size,
                lens_dilations=self.lens_dilations,
                use_lens_bank_qk=self.use_lens_bank_qk,
                lens_qk_kernel_size=self.lens_qk_kernel_size,
                lens_qk_dilations=self.lens_qk_dilations,
                lens_qk_causal=self.lens_qk_causal, name="impl",
            )
        else:
            raise ValueError(f"Unknown attention mode: {self.mode}")
        return impl(x, attn_mask, train=train)
