"""Fused Pallas TPU attention kernels — the performance layer.

The reference materializes every N x N score map in HBM and runs separate
matmul/softmax/product passes (``mop/models/attention_variants.py``; see
SURVEY §3.3). These kernels compute scores, masking, softmax, and the value
matmul blockwise in VMEM so score maps never round-trip through HBM:

- ``flash_attention``: single-view scaled-dot-product attention (used by
  MSA/BaselineMSA and the GPT/Whisper attention paths), optional causal mask,
  custom VJP with recompute backward.
- ``fused_multihop_attention``: D-mode / two-hop dual-path attention —
  both score maps, both softmaxes, the chain product A1 @ A2^(hops-1), the
  gated logit mix, the final softmax, and both value matmuls in ONE kernel
  (N x N state lives only in VMEM; the reference round-trips 6+ maps).
- ``fused_edgewise_lowrank_attention``: the full E-mode lowrank pipeline
  (V score maps, chains, pooled gate factors, rank-factor gate head, gated
  mix, softmax, chained value transport) in one program.
- ``fused_quartet_attention``: standardized dual-path product mix + causal
  softmax + value matmul for the GPT Quartet path.

All kernels fall back to the pure-JAX ops (``mop_tpu.ops.attention``) on
non-TPU backends or unsupported shapes; behavior is bit-compatible up to
float reassociation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import attention as ref

Array = jax.Array


def _op_precision(x):
    """Matmul precision for in-kernel dots, decoupled from the ambient
    jax.default_matmul_precision (which Mosaic would otherwise inherit and
    reject for bf16 operands): true fp32 contract for fp32 operands —
    Mosaic's DEFAULT runs even f32 matmuls as single bf16 passes, which the
    on-chip validation gate (tools/validate_tpu.py) measured at ~1e-3 fwd /
    ~3e-2 grad error vs fp32 — and fast bf16 passes (fp32 accumulate) for
    bf16 operands, the train-time compute dtype."""
    import jax.numpy as _jnp

    if x.dtype == _jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _supported(n: int, dk: int) -> bool:
    # Measured on v5e, min-of-3 bf16 (benchmarks/flash_dispatch.md,
    # tools/bench_flash.py --tune): with the TUNED block pairs below,
    # flash beats XLA at every shape with N >= 1024 (1024: 1.19x,
    # Whisper 1504 non-causal: 1.33x, 2048: 1.37x, 4096: 3.10x) and
    # only reaches parity at 512 (1.01x) — auto-dispatch engages at
    # N >= 1024; pass force=True below that when the N^2 score map's
    # HBM footprint is the binding constraint.
    return n >= 1024 and dk <= 256


def _choose_blocks(n: int):
    """Block size for a (possibly padded) sequence axis: prefer 128 (MXU
    tile); small sequences use the next power-of-two >= 8."""
    for b in (128, 64, 32, 16, 8):
        if n >= b:
            return b
    return 8


def _choose_block_pair(n_q: int, n_kv: int, causal: bool):
    """Tuned (block_q, block_k) per shape class (tools/bench_flash.py
    --tune on v5e, min-of-3 bf16): long sequences want WIDE K/V strips —
    fewer inner-loop trips with 512-wide MXU dots beat the 128-tile
    default by 1.3-1.8x (e.g. Whisper 1504 non-causal: 6.16 ms at
    128/128 vs 3.20 ms at 512/512; 4096 causal: 5.92 -> 3.31 ms at
    256/512). Small sequences keep the per-axis power-of-two choice."""
    if n_kv >= 4096:
        return 256, 512
    if n_kv >= 1024:
        return (256, 512) if causal else (512, 512)
    return _choose_blocks(n_q), _choose_blocks(n_kv)


def _pad_to(x, axis: int, mult: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


# ----------------------------- forward kernel -----------------------------


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, block_q,
                      block_k, n_kv_padded, kv_len):
    """One (batch*head, q-block) program: stream K/V blocks, keep running
    max/denominator (online softmax), accumulate O in fp32. ``kv_len`` is the
    true (unpadded) key count; padded keys are masked out.

    Matmuls take the INPUT dtype (bf16 at train time) with fp32 accumulation
    (``preferred_element_type``) — upcasting operands to f32 first would run
    the MXU at a fraction of peak. Softmax statistics stay fp32.
    """
    import jax.experimental.pallas as pl

    q = q_ref[0]  # (block_q, dk), input dtype
    q_idx = pl.program_id(1)

    m = jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc = jnp.zeros((q.shape[0], v_ref.shape[-1]), jnp.float32)

    num_kv = n_kv_padded // block_k
    padded = kv_len != n_kv_padded

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_op_precision(q),
        ) * scale  # (block_q, block_k) fp32
        cols = i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if causal:
            rows = q_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0)
            s = jnp.where(rows >= cols, s, -jnp.inf)
        if padded:
            s = jnp.where(cols < kv_len, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # guard fully-masked rows: exp(-inf - -inf) -> use safe max
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - m_safe)
        alpha = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # P @ V in the value dtype (full MXU rate), fp32 accumulation.
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_op_precision(v),
        )
        return m_new, l, acc

    if causal:
        # only blocks with k_start <= q_end contribute
        upper = (q_idx + 1) * block_q
        num_needed = jnp.minimum((upper + block_k - 1) // block_k, num_kv)
        m, l, acc = jax.lax.fori_loop(0, num_needed, body, (m, l, acc))
    else:
        m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q: Array, k: Array, v: Array, causal: bool,
                   block_q: Optional[int] = None,
                   block_k: Optional[int] = None) -> Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_orig, dk = q.shape
    kv_len = k.shape[1]
    if block_q is None and block_k is None:
        block_q, block_k = _choose_block_pair(n_orig, kv_len, causal)
    else:
        block_q = block_q or _choose_blocks(n_orig)
        block_k = block_k or _choose_blocks(kv_len)
    q, _ = _pad_to(q, 1, block_q)
    k, _ = _pad_to(k, 1, block_k)
    v, _ = _pad_to(v, 1, block_k)
    n = q.shape[1]
    n_kv = k.shape[1]
    scale = 1.0 / np.sqrt(dk)

    grid = (bh, n // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, n_kv_padded=n_kv, kv_len=kv_len,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dk), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, dk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, dk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dk), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, dk), q.dtype),
    )(q, k, v)
    return out[:, :n_orig]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_bhnd(q, k, v, causal):
    return _flash_forward(q, k, v, causal)


def _flash_fwd_rule(q, k, v, causal):
    o = _flash_forward(q, k, v, causal)
    return o, (q, k, v)


def _flash_bwd_rule(causal, res, do):
    """Backward by recompute with the reference (XLA) path — scores are
    rebuilt once; XLA fuses the softmax-grad chain. Memory stays O(N^2) per
    block of heads only inside this grad computation."""
    q, k, v = res

    def f(q, k, v):
        dk = q.shape[-1]
        s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / np.sqrt(dk)
        if causal:
            n, m = s.shape[-2:]
            mask = jnp.tril(jnp.ones((n, m), bool))
            s = jnp.where(mask, s, -jnp.inf)
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bnm,bmd->bnd", a, v.astype(jnp.float32)).astype(q.dtype)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(do)


_flash_attention_bhnd.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: Array, k: Array, v: Array, causal: bool = False,
    force: Optional[bool] = None,
) -> Array:
    """Blockwise fused attention over (B, H, N, dk) (or (BH, N, dk)) inputs.

    Equivalent to ``softmax(QK^T/sqrt(dk) [+ causal mask]) @ V`` without
    materializing the score map in HBM. Falls back to the reference XLA path
    off-TPU or for unsupported shapes.
    """
    squeeze = False
    if q.ndim == 3:
        q, k, v = q[None], k[None], v[None]
        squeeze = True
    b, h, n, dk = q.shape
    n_kv = k.shape[2]
    use = force if force is not None else (_on_tpu() and _supported(n, dk))
    if not use:
        mask = None
        if causal:
            mask = ref.causal_mask(n)
        out = ref.attend(q, k, v, mask)
    else:
        qf = q.reshape(b * h, n, dk)
        kf = k.reshape(b * h, n_kv, dk)
        vf = v.reshape(b * h, n_kv, dk)
        out = _flash_attention_bhnd(qf, kf, vf, causal).reshape(b, h, n, dk)
    return out[0] if squeeze else out


# ------------------- fused dual-path / multi-hop kernel -------------------
#
# D-mode (MultiHopMSA, reference ``attention_variants.py:163-231``) needs the
# full per-view attention matrices for the chain product A1 @ A2^(hops-1), so
# a Flash-style streaming kernel does not apply. Instead, for N <= 512 the
# whole score algebra runs in VMEM per (batch*head) program: both score maps,
# both softmaxes, the chain product, the gated logit mix, the final softmax,
# and both value matmuls — one kernel, zero N x N HBM round-trips (the
# reference materializes 6+ such maps per layer, SURVEY §3.3).


def _multihop_kernel(q1_ref, k1_ref, v1_ref, q2_ref, k2_ref, v2_ref, w_ref,
                     o_ref, *, scale, gates, beta_not, hops):
    # MXU matmuls take the input dtype (bf16 at bf16 compute) with fp32
    # accumulation — upcasting operands first runs the MXU far below peak.
    # Softmax statistics and the logit algebra stay fp32.
    f32 = jnp.float32
    cdt = q1_ref.dtype
    q1 = q1_ref[0] * jnp.asarray(scale, cdt)
    k1 = k1_ref[0]
    q2 = q2_ref[0] * jnp.asarray(scale, cdt)
    k2 = k2_ref[0]

    def dot_nt(a, b):  # a @ b.T
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=_op_precision(a))

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=_op_precision(a))

    s1 = dot_nt(q1, k1)
    s2 = dot_nt(q2, k2)
    a1 = jax.nn.softmax(s1, axis=-1)
    a2 = jax.nn.softmax(s2, axis=-1)
    a1c = a1.astype(cdt)
    a2c = a2.astype(cdt)
    c_fwd = dot(a1c, a2c)
    for _ in range(max(0, hops - 2)):
        c_fwd = dot(c_fwd.astype(cdt), a2c)
    smix = gates.get("base", 1.0) * s1
    smix = smix + gates.get("and_", 1.0) * s2
    smix = smix + gates.get("or_", 0.0) * (jnp.logaddexp(s1, s2) - s1)
    smix = smix - gates.get("not_", 0.0) * (beta_not * s2)
    smix = smix + gates.get("chain", 0.0) * jnp.log(c_fwd + 1e-6)
    a = jax.nn.softmax(smix, axis=-1)

    v1 = v1_ref[0]
    v2 = v2_ref[0]
    transport = v2
    for _ in range(max(0, hops - 1)):
        transport = dot(a2c, transport.astype(cdt))
    y = dot(a.astype(cdt), v1) + w_ref[0, 0] * dot(a1c, transport.astype(cdt))
    o_ref[0] = y.astype(o_ref.dtype)


def _multihop_forward(q1, k1, v1, q2, k2, v2, gates, beta_not, hops, chain_w):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n, dk = q1.shape
    kernel = functools.partial(
        _multihop_kernel, scale=1.0 / np.sqrt(dk), gates=dict(gates),
        beta_not=float(beta_not), hops=int(hops),
    )
    spec = pl.BlockSpec((1, n, dk), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    w_arr = jnp.asarray(chain_w, jnp.float32).reshape(1, 1)
    w_spec = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[spec] * 6 + [w_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, n, dk), q1.dtype),
        # fp32 operands at N=512 need ~17MB scoped VMEM (HIGHEST-precision
        # dots); the 16MB default is too tight. v5e has 128MB per core.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(q1, k1, v1, q2, k2, v2, w_arr)


def fused_multihop_attention(
    q1: Array, k1: Array, v1: Array,
    q2: Array, k2: Array, v2: Array,
    gates: dict, beta_not: float, hops: int, chain_w: Array,
    force: Optional[bool] = None,
) -> Array:
    """Fully fused D-mode attention over (B, H, N, dk) inputs.

    Computes ``softmax(mix(S1, S2, logC)) @ v1 + w * A1 @ A2^(hops-1) @ v2``
    in one Pallas kernel (N x N maps live only in VMEM). ``chain_w`` is the
    sigmoid'd chain-value weight (a traced scalar is fine). Falls back to the
    composed reference ops off-TPU or when N^2 state exceeds VMEM.

    Differentiated via recompute: the kernel is used for the forward pass and
    the backward runs through the reference composition.
    """
    b, h, n, dk = q1.shape
    vmem_ok = n <= 512 and dk <= 128
    # Crossover measured on v5e (benchmarks/parked_kernels.md, scan-
    # amortized min-of-3, bf16): XLA wins at N <= 128 (0.77-0.81x), the
    # kernel wins at N >= 256 (1.23x) and 512 (1.76x) where the composed
    # path's N^2 map round-trips dominate. Auto-dispatch at the crossover.
    use = force if force is not None else (_on_tpu() and vmem_ok and n >= 256)

    def reference(q1, k1, v1, q2, k2, v2, chain_w):
        s1 = ref.scaled_scores(q1, k1)
        s2 = ref.scaled_scores(q2, k2)
        a1 = jax.nn.softmax(s1, axis=-1)
        a2 = jax.nn.softmax(s2, axis=-1)
        c_fwd = ref.chain_product([a1] + [a2] * (hops - 1))
        smix = ref.multihop_logit_mix(s1, s2, c_fwd, gates, beta_not)
        base = gates.get("base", 1.0)
        if base != 1.0:
            smix = smix + (base - 1.0) * s1
        a = jax.nn.softmax(smix, axis=-1)
        transport = v2
        for _ in range(max(0, hops - 1)):
            transport = jnp.einsum("...nm,...md->...nd", a2, transport)
        y_chain = jnp.einsum("...nm,...md->...nd", a1, transport)
        out = (jnp.einsum("...nm,...md->...nd", a.astype(v1.dtype), v1)
               + chain_w * y_chain)
        return out.astype(q1.dtype)  # match the kernel's output dtype

    if not use:
        return reference(q1, k1, v1, q2, k2, v2, chain_w)

    @jax.custom_vjp
    def fwd(q1, k1, v1, q2, k2, v2, chain_w):
        flat = lambda t: t.reshape(b * h, n, dk)
        out = _multihop_forward(flat(q1), flat(k1), flat(v1),
                                flat(q2), flat(k2), flat(v2),
                                gates, beta_not, hops, chain_w)
        return out.reshape(b, h, n, dk)

    def fwd_rule(*args):
        return fwd(*args), args

    def bwd_rule(res, g):
        _, vjp = jax.vjp(reference, *res)
        return vjp(g)

    fwd.defvjp(fwd_rule, bwd_rule)
    return fwd(q1, k1, v1, q2, k2, v2, chain_w)


# ------------------- fused edgewise (E-mode, lowrank) kernel -------------------
#
# The full EdgewiseMSA lowrank pipeline (reference ``attention_variants.py:
# 453-564`` minus lens banks) in ONE kernel per (batch*head) program:
# V score maps, V softmaxes, forward/backward chain products, row/col-pooled
# gate features, the rank-factor gate head, the 4-way gated logit mix, the
# final softmax, and the chained value transport. The reference materializes
# every intermediate N x N map in HBM (6+ round-trips, SURVEY §3.3); here the
# N x N state never leaves VMEM. Lowrank gates are the benchmark config
# (reference README); dense-conv gates need the full feature stack and keep
# the XLA path.


def _edgewise_math(q, k, v, wrow, brow, wcol, bcol, w, *, scale, beta_not,
                   n_views, gate_rank):
    """The full E-mode lowrank pipeline on per-program VALUES.

    q/k/v: (V, N, dk) in the COMPUTE dtype (bf16 at train time, fp32 in the
    numerics tests). Matmuls take the input dtype with fp32 accumulation —
    upcasting operands to fp32 first would run the MXU at a fraction of peak
    (same rule as the flash kernel); softmax statistics, the gate head, and
    the logit algebra stay fp32. Returns y: (N, dk) fp32. Shared by the
    forward kernel and the fused backward kernel (which differentiates this
    function with ``jax.vjp`` *inside* the kernel body, so every N x N
    residual and cotangent lives only in VMEM).
    """
    f32 = jnp.float32
    cdt = q.dtype  # MXU operand dtype
    V = n_views
    r = gate_rank

    def dot_nt(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=_op_precision(a))

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=_op_precision(a))

    s_list, a_list = [], []
    for i in range(V):
        s = dot_nt(q[i] * jnp.asarray(scale, cdt), k[i])
        s_list.append(s)
        a_list.append(jax.nn.softmax(s, axis=-1))

    ac_list = [a.astype(cdt) for a in a_list]
    if V == 1:
        c_fwd = c_bwd = a_list[0]
    else:
        c_fwd = dot(ac_list[0], ac_list[1])
        for i in range(2, V):
            c_fwd = dot(c_fwd.astype(cdt), ac_list[i])
        c_bwd = dot(ac_list[-1], ac_list[-2])
        for i in range(V - 3, -1, -1):
            c_bwd = dot(c_bwd.astype(cdt), ac_list[i])
    log_cf = jnp.log(c_fwd + 1e-6)
    log_cb = jnp.log(c_bwd + 1e-6)

    # Row/col pooled features, channel order matching the reference stack
    # [S_1..S_V, S_1^T..S_V^T, logC_fwd, logC_bwd]:
    # row-mean of S^T == col-mean of S, so transposes are never materialized.
    def mean_j(s):  # (N, 1): mean over keys j of s(i, j)
        return jnp.mean(s, axis=1, keepdims=True)

    def mean_i(s):  # (N, 1): mean over queries i of s(i, j), as a column
        return jnp.mean(s, axis=0, keepdims=True).T

    # row_feat[c][i] = mean_j feat_c(i, j); mean_j of S^T == mean_i of S.
    row_feat = jnp.concatenate(
        [mean_j(s) for s in s_list] + [mean_i(s) for s in s_list]
        + [mean_j(log_cf), mean_j(log_cb)], axis=1)  # (N, C)
    # col_feat[c][j] = mean_i feat_c(i, j); mean_i of S^T == mean_j of S.
    col_feat = jnp.concatenate(
        [mean_i(s) for s in s_list] + [mean_j(s) for s in s_list]
        + [mean_i(log_cf), mean_i(log_cb)], axis=1)  # (N, C)

    a_fac = dot(row_feat, wrow) + brow
    b_fac = dot(col_feat, wcol) + bcol

    def gate(c):
        # G_c = sigmoid(a_c @ b_c^T) over the rank block of channel c.
        ac = a_fac[:, c * r:(c + 1) * r]
        bc = b_fac[:, c * r:(c + 1) * r]
        return jax.nn.sigmoid(dot_nt(ac, bc))

    return _edgewise_output(s_list, a_list, gate(0), gate(1), gate(2),
                            gate(3), log_cf, v, w, beta_not, V)


def _edgewise_dense_math(q, k, v, *ws, scale, beta_not, n_views):
    """The full E-mode DENSE-gate pipeline on per-program VALUES — the
    reference's default head (``attention_variants.py:250-272`` inside the
    :453-564 pipeline). The per-edge feature stack (N, N, C), the 1x1 MLP
    head, and every score map live only in VMEM; the composed XLA path
    materializes the (BH, N, N, C) stack in HBM.

    ws: (w1 (C, hidden), b1, w2 (hidden, 4), b2, chain_w scalar).
    """
    f32 = jnp.float32
    cdt = q.dtype
    V = n_views
    w1, b1, w2, b2, w = ws

    def dot_nt(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=_op_precision(a))

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=_op_precision(a))

    s_list, a_list = [], []
    for i in range(V):
        s = dot_nt(q[i] * jnp.asarray(scale, cdt), k[i])
        s_list.append(s)
        a_list.append(jax.nn.softmax(s, axis=-1))
    ac_list = [a.astype(cdt) for a in a_list]
    if V == 1:
        c_fwd = c_bwd = a_list[0]
    else:
        c_fwd = dot(ac_list[0], ac_list[1])
        for i in range(2, V):
            c_fwd = dot(c_fwd.astype(cdt), ac_list[i])
        c_bwd = dot(ac_list[-1], ac_list[-2])
        for i in range(V - 3, -1, -1):
            c_bwd = dot(c_bwd.astype(cdt), ac_list[i])
    log_cf = jnp.log(c_fwd + 1e-6)
    log_cb = jnp.log(c_bwd + 1e-6)

    # Per-edge feature stack, channel order [S_i, S_i^T, logC_fwd, logC_bwd],
    # kept as a LIST of (N, N) maps. A (N*N, C) matrix would lane-pad tiny C
    # to 128 (measured: 41 MB scoped VMEM at N=64) and a (C, N, N) -> (C, N*N)
    # collapse is an unsupported Mosaic shape cast — so the 1x1 convs become
    # scalar-weighted map sums (pure VPU; the contractions are tiny anyway).
    feats = s_list + [s.T for s in s_list] + [log_cf, log_cb]
    C = len(feats)
    hidden = w1.shape[1]
    n = s_list[0].shape[0]
    g_acc = [jnp.broadcast_to(b2[c], (n, n)) for c in range(4)]
    for hh in range(hidden):
        xh = b1[hh]
        for c in range(C):
            xh = xh + feats[c] * w1[c, hh]
        xh = _gelu_tanh(xh)
        for c4 in range(4):
            g_acc[c4] = g_acc[c4] + xh * w2[hh, c4]
    g = [jax.nn.sigmoid(gc) for gc in g_acc]

    return _edgewise_output(s_list, a_list, g[0], g[1], g[2],
                            g[3], log_cf, v, w, beta_not, V)


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _edgewise_output(s_list, a_list, g_and, g_or, g_not, g_chain, log_cf, v,
                     w, beta_not, V):
    """Gated logit mix + final softmax + chained value transport (shared by
    the lowrank and dense gate heads). Logit algebra in fp32; the value
    matmuls take the compute dtype (bf16 at train) with fp32 accumulation."""
    f32 = jnp.float32
    cdt = v.dtype

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=_op_precision(a))

    s1 = s_list[0]
    s_sum = s1
    for i in range(1, V):
        s_sum = s_sum + s_list[i]
    m = s_list[0]
    for i in range(1, V):
        m = jnp.maximum(m, s_list[i])
    lse = m + jnp.log(sum(jnp.exp(s - m) for s in s_list))
    mean_others = (s_sum - s1) / max(1, V - 1)
    smix = s1
    smix = smix + g_and * (s_sum - s1)
    smix = smix + g_or * (lse - s1)
    smix = smix - g_not * (beta_not * mean_others)
    smix = smix + g_chain * log_cf
    att = jax.nn.softmax(smix, axis=-1)

    transport = v[V - 1]
    for i in range(V - 1, 0, -1):
        transport = dot(a_list[i].astype(cdt), transport.astype(cdt))
    return (dot(att.astype(cdt), v[0])
            + w * dot(a_list[0].astype(cdt), transport.astype(cdt)))


# --- generic per-(batch*head) fwd/bwd plumbing over an arbitrary weight list ---


def _edgewise_generic_fwd_kernel(*refs, math, n_weights):
    f32 = jnp.float32
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3:3 + n_weights]
    s_ref = refs[3 + n_weights]
    o_ref = refs[4 + n_weights]
    # Weights/stats in fp32; q/k/v stay in their input dtype so the MXU runs
    # bf16 matmuls at train time (math casts per-site).
    ws = [r[:].astype(f32) for r in w_refs]
    y = math(q_ref[0], k_ref[0], v_ref[0], *ws, s_ref[0, 0])
    o_ref[0] = y.astype(o_ref.dtype)


def _edgewise_generic_bwd_kernel(*refs, math, n_weights):
    """Fused backward: recompute the forward in VMEM, differentiate in-kernel
    (``jax.vjp`` inside the kernel body).

    The reference trains through this math with every intermediate N x N map
    round-tripping HBM (``attention_variants.py:453-564``); here residuals AND
    cotangents of the whole score algebra never leave VMEM — HBM traffic is
    inputs + dy in, input-shaped grads out. Weight grads are written
    per-program and reduced by XLA outside (tiny blocks).
    """
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3:3 + n_weights]
    s_ref = refs[3 + n_weights]
    do_ref = refs[4 + n_weights]
    dq_ref, dk_ref, dv_ref = refs[5 + n_weights:8 + n_weights]
    dw_refs = refs[8 + n_weights:8 + 2 * n_weights]
    ds_ref = refs[8 + 2 * n_weights]

    ws = [r[:].astype(f32) for r in w_refs]
    _, vjp = jax.vjp(math, q_ref[0], k_ref[0], v_ref[0], *ws, s_ref[0, 0])
    grads = vjp(do_ref[0].astype(f32))
    dq_ref[0] = grads[0].astype(dq_ref.dtype)
    dk_ref[0] = grads[1].astype(dk_ref.dtype)
    dv_ref[0] = grads[2].astype(dv_ref.dtype)
    for r, g in zip(dw_refs, grads[3:3 + n_weights]):
        if g.ndim == 1:  # bias: block is (1, 1) + shape
            r[0, 0] = g
        else:
            r[0] = g
    ds_ref[pl.program_id(0)] = grads[3 + n_weights]


def _edgewise_io_specs(n, dk, nv, weights, bh):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((1, nv, n, dk), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    # Whole-array weight blocks, replicated across programs.
    wspecs = [
        pl.BlockSpec(a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
                     memory_space=pltpu.VMEM)
        for a in weights
    ]
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    ospec = pl.BlockSpec((1, n, dk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    # Per-program weight-grad outputs. 1-D biases get a singleton middle axis
    # so the block's trailing two dims equal the array's (TPU tiling rule).
    dwspecs, dwshapes = [], []
    for a in weights:
        if a.ndim == 1:
            dwspecs.append(pl.BlockSpec((1, 1) + a.shape, lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM))
            dwshapes.append(jax.ShapeDtypeStruct((bh, 1) + a.shape,
                                                 jnp.float32))
        else:
            dwspecs.append(pl.BlockSpec(
                (1,) + a.shape,
                (lambda nd: lambda i: (i,) + (0,) * nd)(a.ndim),
                memory_space=pltpu.VMEM))
            dwshapes.append(jax.ShapeDtypeStruct((bh,) + a.shape, jnp.float32))
    # Whole-array SMEM block for the scalar grad (size-1 blocks violate TPU
    # tiling); each program writes its own element via program_id.
    dsspec = pl.BlockSpec((bh,), lambda i: (0,), memory_space=pltpu.SMEM)
    return spec, wspecs, sspec, ospec, dwspecs, dwshapes, dsspec


def _interpret_mode():
    """Current force-TPU-interpret state, captured so the backward kernel
    (traced AFTER any ``force_tpu_interpret_mode`` context has exited) runs
    in the same mode as the forward.

    Resolution order: (1) the public override
    ``mop_tpu.config.config.pallas_interpret`` (set it True in test
    fixtures if a jax upgrade breaks auto-detection); (2) best-effort read
    of jax's private context-manager attribute; (3) compiled mode."""
    from ..config import config as _cfg

    if _cfg.pallas_interpret is not None:
        return bool(_cfg.pallas_interpret)
    try:
        from jax._src import config as jax_config

        v = jax_config.pallas_tpu_interpret_mode_context_manager.value
        return v if v is not None else False
    except Exception:  # pragma: no cover - jax-version dependent
        return False


def _edgewise_custom_op(qs, ks, vs, weights, chain_w, math):
    """custom_vjp wrapper: fused forward kernel + fused in-kernel-VJP
    backward over (B, H, V, N, dk) inputs and a flat weight list."""
    import jax.experimental.pallas as pl

    b, h, nv, n, dk = qs.shape
    bh = b * h
    nw = len(weights)
    flat = lambda t: t.reshape(bh, nv, n, dk)
    spec, wspecs, sspec, ospec, dwspecs, dwshapes, dsspec = _edgewise_io_specs(
        n, dk, nv, weights, bh)
    interp = _interpret_mode()
    # The envelope corner (views=8, N=256, dk=128) with fp32-operand
    # (HIGHEST-precision) dots needs ~16.4MB of scoped VMEM — just over the
    # 16MB default. Raise the cap; v5e has 128MB of VMEM per core.
    from jax.experimental.pallas import tpu as pltpu
    cparams = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    def fwd_call(qs, ks, vs, chain_w, *weights):
        kernel = functools.partial(_edgewise_generic_fwd_kernel, math=math,
                                   n_weights=nw)
        out = pl.pallas_call(
            kernel,
            grid=(bh,),
            in_specs=[spec, spec, spec, *wspecs, sspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((bh, n, dk), qs.dtype),
            interpret=interp,
            compiler_params=cparams,
        )(flat(qs), flat(ks), flat(vs), *weights,
          jnp.asarray(chain_w, jnp.float32).reshape(1, 1))
        return out.reshape(b, h, n, dk)

    def bwd_call(qs, ks, vs, chain_w, weights, dy):
        kernel = functools.partial(_edgewise_generic_bwd_kernel, math=math,
                                   n_weights=nw)
        outs = pl.pallas_call(
            kernel,
            grid=(bh,),
            in_specs=[spec, spec, spec, *wspecs, sspec, ospec],
            out_specs=[spec, spec, spec, *dwspecs, dsspec],
            out_shape=[
                jax.ShapeDtypeStruct((bh, nv, n, dk), qs.dtype),
                jax.ShapeDtypeStruct((bh, nv, n, dk), ks.dtype),
                jax.ShapeDtypeStruct((bh, nv, n, dk), vs.dtype),
                *dwshapes,
                jax.ShapeDtypeStruct((bh,), jnp.float32),
            ],
            interpret=interp,
            compiler_params=cparams,
        )(flat(qs), flat(ks), flat(vs), *weights,
          jnp.asarray(chain_w, jnp.float32).reshape(1, 1),
          dy.reshape(bh, n, dk))
        unflat = lambda t: t.reshape(b, h, nv, n, dk)
        dws = []
        for a, g in zip(weights, outs[3:3 + nw]):
            axes = (0, 1) if a.ndim == 1 else (0,)
            dws.append(jnp.sum(g, axis=axes).astype(a.dtype))
        dw_scalar = jnp.sum(outs[3 + nw]).astype(
            jnp.result_type(chain_w)).reshape(jnp.shape(chain_w))
        return (unflat(outs[0]), unflat(outs[1]), unflat(outs[2]),
                dw_scalar, *dws)

    @jax.custom_vjp
    def op(qs, ks, vs, chain_w, *weights):
        return fwd_call(qs, ks, vs, chain_w, *weights)

    def fwd_rule(*args):
        return op(*args), args

    def bwd_rule(res, g):
        qs, ks, vs, chain_w, *weights = res
        return bwd_call(qs, ks, vs, chain_w, weights, g)

    op.defvjp(fwd_rule, bwd_rule)
    return op(qs, ks, vs, chain_w, *weights)


def fused_edgewise_lowrank_attention(
    qs: Array, ks: Array, vs: Array,
    wrow: Array, brow: Array, wcol: Array, bcol: Array,
    beta_not: float, chain_w: Array,
    force: Optional[bool] = None,
) -> Array:
    """Fully fused E-mode lowrank attention, differentiable end-to-end.

    qs/ks/vs: (B, H, V, N, dk) per-view tensors (already per-view scaled when
    share_qkv). wrow/wcol: (C, 4r) gate-head kernels with C = 2V+2;
    brow/bcol: (4r,). Returns (B, H, N, dk). Falls back off-TPU / large N.

    Training runs through a FUSED backward kernel: the per-program forward is
    recomputed in VMEM and differentiated in-kernel, so neither residuals nor
    cotangents of the N x N score algebra ever touch HBM (the reference
    round-trips 6+ maps per direction, ``attention_variants.py:453-564``).
    Measured 1.24x over XLA autodiff on the full 5M E-mode train step
    (benchmarks/edgewise_train_kernel.md).
    """
    b, h, nv, n, dk = qs.shape
    gate_rank = wrow.shape[1] // 4
    vmem_ok = n <= 256 and dk <= 128 and nv <= 8
    use = force if force is not None else (_on_tpu() and vmem_ok)
    if not use:
        return None  # caller composes the reference path
    math = functools.partial(
        _edgewise_math, scale=1.0 / np.sqrt(dk), beta_not=float(beta_not),
        n_views=int(nv), gate_rank=int(gate_rank))
    return _edgewise_custom_op(qs, ks, vs, (wrow, brow, wcol, bcol),
                               chain_w, math)


def fused_edgewise_dense_attention(
    qs: Array, ks: Array, vs: Array,
    w1: Array, b1: Array, w2: Array, b2: Array,
    beta_not: float, chain_w: Array,
    wk3: Optional[Array] = None, bk3: Optional[Array] = None,
    force: Optional[bool] = None,
) -> Array:
    """Fully fused E-mode DENSE-gate attention (the ab5 default config),
    differentiable end-to-end.

    w1/b1: the 1x1 input conv as a (C, hidden) matmul; w2/b2: the 1x1 output
    head (hidden, 4); wk3/bk3 (optional): the 3x3 mid conv (3, 3, hidden,
    hidden), applied as 9 shifted matmuls. The (N, N, C) per-edge feature
    stack lives only in VMEM — the composed XLA path writes it to HBM.
    Matches reference ``attention_variants.py:250-272`` + :453-564.
    """
    b, h, nv, n, dk = qs.shape
    if wk3 is not None:
        # use_k3: the 3x3 stencil over the hidden maps needs 9*hidden^2
        # scalar-weighted shifted adds in-kernel (no MXU formulation fits
        # Mosaic's layout rules) — measured hopeless vs XLA's batched conv.
        # The composed path keeps it.
        return None
    # Tighter N bound than lowrank: the hidden (N, N) activation maps add
    # VMEM pressure on top of the score algebra.
    vmem_ok = n <= 128 and dk <= 128 and nv <= 8
    use = force if force is not None else (_on_tpu() and vmem_ok)
    if not use:
        return None  # caller composes the reference path
    math = functools.partial(
        _edgewise_dense_math, scale=1.0 / np.sqrt(dk),
        beta_not=float(beta_not), n_views=int(nv))
    return _edgewise_custom_op(qs, ks, vs, (w1, b1, w2, b2), chain_w, math)


# ----------------------- fused quartet attention kernel -----------------------
#
# Quartet causal attention (reference ``quartet_attn_patch.py:75-127``): two
# QK paths, per-row standardization with the UNBIASED std, learned scalar mix
# ``(1-m)*s1n + m*(s1n*s2n)*qscale``, causal mask, softmax, value matmul.
# Row statistics need the full row, so (like the multihop kernel) each
# (batch*head) program holds its N x N maps in VMEM; nothing round-trips HBM.


def _quartet_kernel(q_ref, k_ref, v_ref, q2_ref, k2_ref, mix_ref, o_ref, *,
                    scale, eps, n):
    f32 = jnp.float32

    def dot_nt(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=_op_precision(a))

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=_op_precision(a))

    def standardize(s):
        mu = jnp.mean(s, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(s - mu), axis=-1, keepdims=True) / max(1, n - 1)
        return (s - mu) / (jnp.sqrt(var) + eps)

    # Dots take the input dtype (bf16 at bf16 compute) with fp32 accumulation;
    # standardization/softmax statistics stay fp32.
    cdt = q_ref.dtype
    sc = jnp.asarray(scale, cdt)
    s1 = standardize(dot_nt(q_ref[0] * sc, k_ref[0]))
    s2 = standardize(dot_nt(q2_ref[0] * sc, k2_ref[0]))
    m = mix_ref[0, 0]
    qscale = mix_ref[0, 1]
    scores = (1.0 - m) * s1 + m * (s1 * s2) * qscale
    rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(rows >= cols, scores, -jnp.inf)
    att = jax.nn.softmax(scores, axis=-1)
    o_ref[0] = dot(att.astype(cdt), v_ref[0]).astype(o_ref.dtype)


def _quartet_reference(q, k, v, q2, k2, mixture, quartet_scale, eps):
    n = q.shape[-2]
    s1 = ref.standardize_scores(ref.scaled_scores(q, k), eps)
    s2 = ref.standardize_scores(ref.scaled_scores(q2, k2), eps)
    scores = (1.0 - mixture) * s1 + mixture * (s1 * s2) * quartet_scale
    scores = ref.apply_mask(scores, ref.causal_mask(n))
    a = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...nm,...md->...nd", a.astype(v.dtype), v)


def _quartet_pallas(q, k, v, q2, k2, mixture, quartet_scale, eps, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, dk = q.shape
    flat = lambda t: t.reshape(b * h, n, dk)
    kernel = functools.partial(
        _quartet_kernel, scale=1.0 / np.sqrt(dk), eps=float(eps), n=n)
    spec = pl.BlockSpec((1, n, dk), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    mix = jnp.stack([jnp.asarray(mixture, jnp.float32).reshape(()),
                     jnp.asarray(quartet_scale, jnp.float32).reshape(())])
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec] * 5 + [
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n, dk), q.dtype),
        interpret=interpret,
    )(flat(q), flat(k), flat(v), flat(q2), flat(k2), mix.reshape(1, 2))
    return out.reshape(b, h, n, dk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _quartet_op(q, k, v, q2, k2, mixture, quartet_scale, eps, interpret):
    return _quartet_pallas(q, k, v, q2, k2, mixture, quartet_scale, eps,
                           interpret)


def _quartet_fwd_rule(q, k, v, q2, k2, mixture, quartet_scale, eps, interpret):
    o = _quartet_pallas(q, k, v, q2, k2, mixture, quartet_scale, eps,
                        interpret)
    return o, (q, k, v, q2, k2, mixture, quartet_scale)


def _quartet_bwd_rule(eps, interpret, res, dy):
    """Backward by recompute through the reference composition (pure XLA) —
    the same pattern as flash. Keeps the default-ON fused kernel grad-safe
    wherever it is dispatched (pipeline stages, eval-mode grad loops)."""
    f = lambda *a: _quartet_reference(*a, eps)
    _, vjp = jax.vjp(f, *res)
    return vjp(dy)


_quartet_op.defvjp(_quartet_fwd_rule, _quartet_bwd_rule)


def fused_quartet_attention(
    q: Array, k: Array, v: Array, q2: Array, k2: Array,
    mixture: Array, quartet_scale: Array, eps: float = 1e-5,
    force: Optional[bool] = None,
) -> Array:
    """Fused causal Quartet attention over (B, H, N, dk).

    ``mixture`` is the already-sigmoided scalar gate; ``quartet_scale`` the
    learned scale. Falls back to the composed reference math off-TPU / large N.
    Differentiable: the fused forward carries a custom VJP whose backward
    recomputes via the reference composition (XLA), so ``jax.grad`` through
    the default-ON dispatch is safe (e.g. eval-mode grad loops, pipeline
    stages).
    """
    b, h, n, dk = q.shape
    vmem_ok = n <= 512 and dk <= 128
    use = force if force is not None else (_on_tpu() and vmem_ok)
    mixture = jnp.asarray(mixture, jnp.float32).reshape(())
    quartet_scale = jnp.asarray(quartet_scale, jnp.float32).reshape(())
    if not use:
        return _quartet_reference(q, k, v, q2, k2, mixture, quartet_scale,
                                  eps)
    return _quartet_op(q, k, v, q2, k2, mixture, quartet_scale, float(eps),
                       _interpret_mode())
