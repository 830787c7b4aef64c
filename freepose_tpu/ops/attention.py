"""Fused flash-attention Pallas kernel for TPU.

The hot compute of every model in this framework is ViT self-attention
(DINOv2 L at 901 tokens × 24 layers over 600-view template batches; SAM2
Hiera windows; reference equivalents ran torch SDPA/flash kernels,
SURVEY.md §2.6.3). This kernel fuses QK^T, the online-softmax normalization,
and PV into one VMEM-resident pass per (batch·head, q-block), streaming K/V
in blocks — no [N, N] attention matrix ever materializes in HBM.

Grid: (B*H, num_q_blocks); K/V stream over a lax.fori_loop with running
(max, sum, accumulator) in fp32. Sequence lengths pad to the block size with
masked logits. `flash_attention` pads/reshapes and falls back to the dense
XLA path on non-TPU backends (the kernel itself is also exercised on CPU via
interpret mode in tests).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, seq_len: int):
    """One (batch·head, q-block) program: stream K/V blocks with online
    softmax. q_ref: [bq, d]; k_ref/v_ref: [Nk_pad, d]; o_ref: [bq, d]."""
    # Dots keep the inputs' NATIVE dtype with fp32 accumulation, matching
    # the dense XLA path's numerics exactly (bf16 multiplicands, f32
    # accumulator, post-scale). Perf-neutral at ViT-L shapes (measured
    # 129.3 vs 129.9 ms on the b=16 featurize batch -- the kernel is
    # VPU/memory-bound there, not MXU-bound), but avoids the f32-upcast
    # MXU penalty for any shape that IS dot-bound.
    q = q_ref[:]
    bq, d = q.shape
    nk_pad = k_ref.shape[0]
    num_kb = nk_pad // block_k

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :]
        v = v_ref[pl.ds(kb * block_k, block_k), :]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        # Mask padded keys.
        key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        logits = jnp.where(key_idx < seq_len, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l_final, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l_final, 1e-30)).astype(o_ref.dtype)


def _kernel_squeeze(q_ref, k_ref, v_ref, o_ref, **kw):
    """pallas blocks carry the grid axis as a leading size-1 dim; squeeze."""
    _flash_kernel(q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0], **kw)


def _flash_kernel_single(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int):
    """Whole-KV variant: one (batch·head) program with ALL keys resident —
    no online-softmax loop, no K/V block slicing, so the head dim can stay
    NATIVE (Mosaic rejects pl.ds slices of sub-128-lane tiles; padding d
    64 → 128 in HBM doubled K/V traffic and MXU work). Used when the f32
    score tile [n, nk] fits VMEM — the ViT regime (n ≈ 905)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bq = q.shape[0]
    nk_pad = k.shape[0]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    key_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, nk_pad), 1)
    logits = jnp.where(key_idx < seq_len, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret", "single_budget"),
)
def flash_attention(
    q: jax.Array,  # [B, H, N, d]
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    single_budget: int = 6 << 20,
) -> jax.Array:
    b, h, n, d = q.shape
    nk = k.shape[2]

    def _round16(x: int) -> int:  # bf16 sublane tile is 16
        return max(16, -(-x // 16) * 16)

    # Whole-head q blocks up to 1024 rows: at ViT shapes (n ≈ 905) the grid
    # collapses to one step per (batch·head) with K/V fetched ONCE — the old
    # (b·h, n/256) grid re-read the full K/V per 256-row q block (4× HBM) and
    # amortized per-step overhead poorly (profiled 1.16 ms/layer vs the
    # ~0.35 ms roofline at ViT-L b=8).
    block_q = min(block_q, _round16(n))
    n_pad = -(-n // block_q) * block_q
    nk16 = _round16(nk)

    # Native-d q-block regime: ALL keys resident per program (no K slicing,
    # so the head dim stays NATIVE — padding d 64→128 in HBM doubled K/V
    # traffic and MXU work), q split into balanced 16-multiple blocks whose
    # f32 score tile fits the VMEM budget; K/V are re-fetched per q-block
    # (tiny: nk·d bf16). Covers both the whole-head ViT-L shape (n ≈ 905 —
    # one block, the round-2 tuning) and longer rows like the 1374-token
    # ViT-B@518 confidence stream, which previously fell through to the
    # streaming regime and paid 2× MXU work for the d=128 padding.
    budget = single_budget
    # The kernel keeps K AND V whole-row resident per program in addition to
    # the f32 score tile — budget both, else intermediate key lengths
    # (~16k-98k tokens) would pick this regime and blow VMEM at compile
    # while the streaming regime that handles them sits unreachable.
    kv_bytes = 2 * nk16 * d * jnp.dtype(q.dtype).itemsize
    bq_fit = max(0, (budget - kv_bytes) // (4 * nk16)) // 16 * 16
    if bq_fit >= 16:
        n16 = _round16(n)
        n_blocks = -(-n16 // min(bq_fit, block_q))
        bq = _round16(-(-n16 // n_blocks))
        n_pad_s = n_blocks * bq
        qp = _pad_to(q, n_pad_s, 2).reshape(b * h, n_pad_s, d)
        kp = _pad_to(k, nk16, 2).reshape(b * h, nk16, d)
        vp = _pad_to(v, nk16, 2).reshape(b * h, nk16, d)
        out = pl.pallas_call(
            partial(_flash_kernel_single, scale=scale, seq_len=nk),
            out_shape=jax.ShapeDtypeStruct((b * h, n_pad_s, d), q.dtype),
            grid=(b * h, n_blocks),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk16, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk16, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(qp, kp, vp)
        return out.reshape(b, h, n_pad_s, d)[:, :, :n]

    # Streaming regime (large n·nk, e.g. Hiera global blocks at 4096 tokens):
    # K blocks sized so the f32 score tile stays a few MB of VMEM, balanced
    # to equal sizes covering nk with minimal padding. The block slicing
    # needs full 128-lane tiles, so d pads to 128 here.
    block_k = min(block_k, nk16)
    block_k = _round16(-(-nk16 // max(1, -(-nk16 // block_k))))
    nk_pad = -(-nk16 // block_k) * block_k
    d_pad = max(-(-d // 128) * 128, 128)

    qp = _pad_to(_pad_to(q, n_pad, 2), d_pad, 3).reshape(b * h, n_pad, d_pad)
    kp = _pad_to(_pad_to(k, nk_pad, 2), d_pad, 3).reshape(b * h, nk_pad, d_pad)
    vp = _pad_to(_pad_to(v, nk_pad, 2), d_pad, 3).reshape(b * h, nk_pad, d_pad)

    grid = (b * h, n_pad // block_q)
    out = pl.pallas_call(
        partial(_kernel_squeeze, scale=scale, block_k=block_k, seq_len=nk),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]




def _stream_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr, *, scale: float, nk_blocks: int
):
    """Streaming flash attention: grid axis 2 sweeps K/V blocks sequentially
    with running (max, sum, acc) in VMEM scratch — K/V never fully resident,
    so arbitrarily long key sets (SAM2 memory cross-attention: ~28k keys)
    fit. mask_ref [1, block_k] int8: 0 = masked key (padding or invalid
    memory slot)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Native-dtype MXU dots with fp32 accumulation (see _flash_kernel).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    logits = jnp.where(mask_ref[:, :] != 0, logits, NEG_INF)

    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc_scr[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc_new

    @pl.when(kb == nk_blocks - 1)
    def _fin():
        o_ref[0] = (acc_new / jnp.maximum(l_new, 1e-30)).astype(o_ref.dtype)


def _valid_mask(kv_mask, b: int, nk: int, nk_pad: int) -> jax.Array:
    """[b, nk_pad] int8 combining the length padding with an optional
    per-batch key validity mask."""
    valid = jnp.arange(nk_pad) < nk
    valid = jnp.broadcast_to(valid[None, :], (b, nk_pad))
    if kv_mask is not None:
        valid = valid & _pad_to(kv_mask.astype(bool), nk_pad, 1)
    return valid.astype(jnp.int8)


@partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention_stream(
    q: jax.Array,  # [B, H, N, d]
    k: jax.Array,  # [B, H, Nk, d]
    v: jax.Array,
    scale: float,
    kv_mask: jax.Array | None = None,  # [B, Nk] bool; False = masked key
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    # Default blocks 512×1024 (f32 score tile 2 MB): SAM2 memory cross-attn
    # (n=4096, nk≈28.7k, one 256-d head) previously ran a (1, 16, 56) grid of
    # 256×512 tiles — 896 steps whose per-step overhead dominated the ~0.6 ms
    # of MXU work per layer.
    b, h, n, d = q.shape
    nk = k.shape[2]

    def _round16(x: int) -> int:
        return max(16, -(-x // 16) * 16)

    block_q = min(block_q, _round16(n))
    block_k = min(block_k, _round16(nk))
    n_pad = -(-n // block_q) * block_q
    nk_pad = -(-nk // block_k) * block_k
    d_pad = max(-(-d // 128) * 128, 128)

    qp = _pad_to(_pad_to(q, n_pad, 2), d_pad, 3).reshape(b * h, n_pad, d_pad)
    kp = _pad_to(_pad_to(k, nk_pad, 2), d_pad, 3).reshape(b * h, nk_pad, d_pad)
    vp = _pad_to(_pad_to(v, nk_pad, 2), d_pad, 3).reshape(b * h, nk_pad, d_pad)
    mask = _valid_mask(kv_mask, b, nk, nk_pad)

    nk_blocks = nk_pad // block_k
    grid = (b * h, n_pad // block_q, nk_blocks)
    out = pl.pallas_call(
        partial(_stream_kernel, scale=scale, nk_blocks=nk_blocks),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i, j, kb: (i // h, kb), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda i, j, kb: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, mask)
    return out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]


def _stream_bias_kernel(
    q_ref, k_ref, v_ref, mask_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr,
    *, scale: float, nk_blocks: int,
):
    """Streaming flash attention with an additive logit bias (BEiT relative
    position bias). Same accumulation as `_stream_kernel`; bias is shared
    across batch (per-head), so its block index is i % h."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Native-dtype MXU dots with fp32 accumulation (see _flash_kernel).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[0].astype(jnp.float32)
    logits = jnp.where(mask_ref[:, :] != 0, logits, NEG_INF)

    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc_scr[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc_new

    @pl.when(kb == nk_blocks - 1)
    def _fin():
        o_ref[0] = (acc_new / jnp.maximum(l_new, 1e-30)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention_bias(
    q: jax.Array,  # [B, H, N, d]
    k: jax.Array,
    v: jax.Array,
    scale: float,
    bias: jax.Array,  # [H, N, Nk] additive logit bias, shared across batch
    kv_mask: jax.Array | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    b, h, n, d = q.shape
    nk = k.shape[2]

    def _round16(x: int) -> int:
        return max(16, -(-x // 16) * 16)

    block_q = min(block_q, _round16(n))
    block_k = min(block_k, _round16(nk))
    n_pad = -(-n // block_q) * block_q
    nk_pad = -(-nk // block_k) * block_k
    d_pad = max(-(-d // 128) * 128, 128)

    qp = _pad_to(_pad_to(q, n_pad, 2), d_pad, 3).reshape(b * h, n_pad, d_pad)
    kp = _pad_to(_pad_to(k, nk_pad, 2), d_pad, 3).reshape(b * h, nk_pad, d_pad)
    vp = _pad_to(_pad_to(v, nk_pad, 2), d_pad, 3).reshape(b * h, nk_pad, d_pad)
    bp = _pad_to(_pad_to(bias, n_pad, 1), nk_pad, 2)
    mask = _valid_mask(kv_mask, b, nk, nk_pad)

    nk_blocks = nk_pad // block_k
    grid = (b * h, n_pad // block_q, nk_blocks)
    out = pl.pallas_call(
        partial(_stream_bias_kernel, scale=scale, nk_blocks=nk_blocks),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i, j, kb: (i // h, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, block_k), lambda i, j, kb: (i % h, j, kb), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda i, j, kb: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, mask, bp)
    return out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]


def flash_attention_bias_auto(q, k, v, scale: float, bias) -> jax.Array:
    """Platform-gated biased attention (BEiT blocks): Pallas on TPU, dense
    XLA with the bias added to fp32 logits elsewhere."""
    interpret = FORCE_INTERPRET
    if interpret or jax.devices()[0].platform in ("tpu", "axon"):
        return flash_attention_bias(q, k, v, scale, bias, interpret=interpret)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits + bias[None].astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", w, v)


def dense_attention_masked(q, k, v, scale: float, kv_mask=None) -> jax.Array:
    """Dense XLA attention with optional per-batch key mask — the CPU/parity
    fallback for the flash paths. q/k/v [B, H, N, d]; kv_mask [B, Nk]."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", w, v)


# Combined K+V VMEM footprint (bytes) above which the full-KV kernel risks
# exceeding VMEM and the streaming kernel is used instead.
_FULL_KV_VMEM_LIMIT = 6 * 1024 * 1024

# Test escape hatch: force the Pallas kernels in interpret mode on CPU so
# model-level flash paths can be parity-tested without TPU hardware.
FORCE_INTERPRET = False


def flash_attention_auto(q, k, v, scale: float, kv_mask=None) -> jax.Array:
    """Platform-gated attention: Pallas flash on TPU (full-KV kernel when K/V
    fit VMEM, streaming kernel otherwise), dense XLA elsewhere."""
    interpret = FORCE_INTERPRET
    if not interpret and jax.devices()[0].platform not in ("tpu", "axon"):
        return dense_attention_masked(q, k, v, scale, kv_mask)
    nk, d = k.shape[2], k.shape[3]
    d_pad = max(-(-d // 128) * 128, 128)
    nk_pad = -(-nk // 256) * 256
    footprint = 2 * nk_pad * d_pad * q.dtype.itemsize
    if kv_mask is None and footprint <= _FULL_KV_VMEM_LIMIT:
        return flash_attention(q, k, v, scale, interpret=interpret)
    return flash_attention_stream(q, k, v, scale, kv_mask=kv_mask, interpret=interpret)


def flash_attention_fn(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Drop-in `attention_fn` for freepose_tpu.models.vit.MultiHeadAttention:
    Pallas flash attention on TPU, dense XLA fallback elsewhere.

    Batch-1 calls take the dense path even on TPU: at ViT-L@420 shapes
    (1×16×905×64 bf16) dense measures 9.7 ms/img vs flash 12.5 on one v5e —
    the kernel pads d 64→128 (2× structural-zero matmul work) and its
    per-step overhead isn't amortized at so few grid steps, while the dense
    [905, 905] score tensor is small enough that avoided HBM traffic no
    longer pays. Flash wins from b≥4 (7.9 vs 14.2 ms/img — measured by
    scripts/bench_features.py); the single-query featurize of the fine-refine
    hit path is exactly the b=1 case."""
    if q.shape[0] > 1 and jax.devices()[0].platform in ("tpu", "axon"):
        return flash_attention(q, k, v, scale)
    from freepose_tpu.models.vit import dot_product_attention

    return dot_product_attention(q, k, v, scale)
