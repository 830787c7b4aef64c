"""SAM2 video tracking with a FIXED-CAPACITY functional memory state.

TPU-native re-design of the vendored video predictor (reference
segment-anything-2/sam2/sam2_video_predictor.py:40-957 and
sam2_base.py:493-829). The reference keeps mutable dicts of per-frame tensors
with dynamic membership; here the per-object tracking state is a static-shape
pytree —

  * 7 spatial mask-memory slots (slot 0 = conditioning frame, slots 1..6 a
    ring buffer of the most recent tracked frames), each [HW_mem, 64];
  * 16 object-pointer slots (slot 0 = conditioning pointer, 1..15 ring);
  * validity masks + frame indices for both —

so one whole tracking step (memory read -> memory attention -> SAM heads ->
memory write -> state update) compiles to a single jit program. Masked
attention over padded slots is numerically identical to the reference's
variable-length concatenation (tested in test_sam2_memory.py).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.models.sam2.memory import (
    MemoryAttention,
    MemoryConfig,
    MemoryEncoder,
    sine_1d_pe,
)
from freepose_tpu.models.sam2.mask_decoder import FeedForwardN
from freepose_tpu.models.sam2.model import Sam2Config, Sam2ImageModel
from freepose_tpu.ops.sampling import resize_bilinear

NO_OBJ_SCORE = -1024.0


@dataclasses.dataclass(frozen=True)
class Sam2VideoConfig:
    sam: Sam2Config = Sam2Config()
    mem: MemoryConfig = MemoryConfig()
    image_size: int = 1024
    mem_grid: int = 64  # memory feature side = image_size / 16
    enable_occlusion_embedding: bool = True
    enable_ptr_temporal_pos: bool = True
    multimask_for_tracking: bool = True
    max_point_prompts: int = 8  # static pad for point prompts


class ObjectState(NamedTuple):
    """Fixed-capacity per-object tracking memory (one object, batch=1)."""

    maskmem: jax.Array  # [num_maskmem, HW_mem, mem_dim]
    maskmem_frame: jax.Array  # [num_maskmem] int32 frame index of each slot
    maskmem_valid: jax.Array  # [num_maskmem] bool
    ptrs: jax.Array  # [max_ptrs, hidden]
    ptr_frame: jax.Array  # [max_ptrs] int32
    ptr_valid: jax.Array  # [max_ptrs] bool
    ring_pos: jax.Array  # [] int32: next non-cond maskmem slot (1..num_maskmem-1)
    ptr_ring_pos: jax.Array  # [] int32: next non-cond pointer slot (1..max_ptrs-1)


def init_object_state(cfg: Sam2VideoConfig) -> ObjectState:
    m = cfg.mem
    hw = cfg.mem_grid * cfg.mem_grid
    return ObjectState(
        maskmem=jnp.zeros((m.num_maskmem, hw, m.mem_dim), jnp.float32),
        maskmem_frame=jnp.full((m.num_maskmem,), -1, jnp.int32),
        maskmem_valid=jnp.zeros((m.num_maskmem,), bool),
        ptrs=jnp.zeros((m.max_obj_ptrs, m.hidden_size), jnp.float32),
        ptr_frame=jnp.full((m.max_obj_ptrs,), -1, jnp.int32),
        ptr_valid=jnp.zeros((m.max_obj_ptrs,), bool),
        ring_pos=jnp.int32(1 if m.memory_temporal_stride == 1 else 2),
        ptr_ring_pos=jnp.int32(1),
    )


class Sam2VideoModel(nn.Module):
    config: Sam2VideoConfig

    def setup(self):
        c = self.config
        self.image = Sam2ImageModel(c.sam)
        self.memory_attention = MemoryAttention(c.mem)
        self.memory_encoder = MemoryEncoder(c.mem)
        self.memory_temporal_pos = self.param(
            "memory_temporal_pos", nn.initializers.zeros,
            (c.mem.num_maskmem, 1, 1, c.mem.mem_dim),
        )
        self.no_object_pointer = self.param(
            "no_object_pointer", nn.initializers.zeros, (1, c.mem.hidden_size)
        )
        self.no_memory_pos = self.param(
            "no_memory_pos", nn.initializers.zeros, (1, 1, c.mem.hidden_size)
        )
        self.object_pointer_proj = FeedForwardN(
            c.mem.hidden_size, c.mem.hidden_size, 3, name="obj_ptr_proj"
        )
        if c.enable_ptr_temporal_pos:
            self.ptr_tpos_proj = nn.Dense(c.mem.mem_dim, name="ptr_tpos_proj")
        if c.enable_occlusion_embedding:
            self.occlusion_embedding = self.param(
                "occlusion_embedding", nn.initializers.zeros, (1, c.mem.mem_dim)
            )
        self.mask_downsample = nn.Conv(1, (4, 4), strides=(4, 4), name="mask_downsample")

    # ------------------------------------------------------------------ #
    def embed_frame(self, pixels: jax.Array):
        """Normalized [1, 3, S, S] frame -> (pyramid [s0', s1', s2_raw], pos).
        s0'/s1' carry the SAM-head projections; s2_raw has NO no-memory
        embedding (memory conditioning decides)."""
        return self.image.embed_image(pixels, with_memory_placeholder=False)

    # ------------------------------------------------------------------ #
    def _gather_memory(self, state: ObjectState, frame_idx: jax.Array, num_frames: float, reverse: jax.Array):
        """Build padded memory tokens + positions + validity for attention."""
        c = self.config
        m = c.mem
        hw = c.mem_grid * c.mem_grid
        sign = jnp.where(reverse, -1, 1)

        # Spatial memories: offsets and temporal-position rows.
        offsets = sign * (frame_idx - state.maskmem_frame)  # [S]
        is_cond = jnp.arange(m.num_maskmem) == 0
        r = m.memory_temporal_stride
        if r == 1:
            valid = state.maskmem_valid & (is_cond | ((offsets >= 1) & (offsets <= m.num_maskmem - 1)))
            t_rel = offsets
        else:
            # Stride-r selection (reference sam2_base.py:533-558), in
            # "virtual time" v = sign*frame so one formula covers forward and
            # reverse (floor division handles the reverse ceil): memories =
            # the last frame (t_rel 1) + frames anchor - k*r for k=0.. with
            # anchor = ((v-2)//r)*r, t_rel = 2+k.
            v = sign * frame_idx
            vj = sign * state.maskmem_frame
            anchor = ((v - 2) // r) * r
            is_last = vj == v - 1
            on_grid = (jnp.mod(vj, r) == 0) & (vj <= anchor)
            t_rel = jnp.where(is_last, 1, 2 + (anchor - vj) // r)
            valid = state.maskmem_valid & (
                is_cond | is_last | (on_grid & (t_rel <= m.num_maskmem - 1))
            )
        # Conditioning slot uses tpos row [-1] (reference/HF index offset-1
        # with offset 0); non-cond uses row t_rel-1.
        tpos_idx = jnp.where(is_cond, m.num_maskmem - 1, jnp.clip(t_rel - 1, 0, m.num_maskmem - 1))
        from freepose_tpu.models.sam2.hiera import sine_position_encoding

        spatial_pos = sine_position_encoding((c.mem_grid, c.mem_grid), m.mem_dim).reshape(hw, m.mem_dim)
        tpos = self.memory_temporal_pos[tpos_idx, 0, 0]  # [S, mem_dim]
        mem_tokens = state.maskmem.reshape(m.num_maskmem * hw, m.mem_dim)
        mem_pos = (spatial_pos[None] + tpos[:, None]).reshape(m.num_maskmem * hw, m.mem_dim)
        mem_mask = jnp.repeat(valid, hw)

        # Object pointers: cond pointer (any past offset) + non-cond ring
        # within max_obj_ptrs-1.
        p_off = sign * (frame_idx - state.ptr_frame)  # [P]
        p_is_cond = jnp.arange(m.max_obj_ptrs) == 0
        max_ptrs_use = jnp.minimum(num_frames, m.max_obj_ptrs)
        p_valid = state.ptr_valid & (p_off >= 0) & (
            p_is_cond | ((p_off >= 1) & (p_off <= max_ptrs_use - 1))
        )
        if c.enable_ptr_temporal_pos:
            norm = jnp.maximum(max_ptrs_use - 1.0, 1.0)
            tdiff = p_off.astype(jnp.float32) / norm
            pe = sine_1d_pe(tdiff, m.hidden_size)
            ptr_pos = self.ptr_tpos_proj(pe)  # [P, mem_dim]
        else:
            ptr_pos = jnp.zeros((m.max_obj_ptrs, m.mem_dim))
        splits = m.hidden_size // m.mem_dim
        ptr_tokens = state.ptrs.reshape(m.max_obj_ptrs * splits, m.mem_dim)
        ptr_pos_tokens = jnp.repeat(ptr_pos, splits, axis=0)
        ptr_mask = jnp.repeat(p_valid, splits)

        memory = jnp.concatenate([mem_tokens, ptr_tokens], axis=0)[None]
        memory_pos = jnp.concatenate([mem_pos, ptr_pos_tokens], axis=0)[None]
        kv_mask = jnp.concatenate([mem_mask, ptr_mask])[None]
        n_ptr_tokens = m.max_obj_ptrs * splits
        return memory, memory_pos, kv_mask, n_ptr_tokens

    # ------------------------------------------------------------------ #
    def _sam_step(self, pyramid, points, labels, mask_prompt, multimask: bool):
        """SAM heads on a (memory-conditioned) pyramid; returns video-style
        outputs (best mask, high-res mask, pointer, obj logits)."""
        c = self.config
        masks, iou, sam_tokens, obj_logits = self.image.decode_masks(
            pyramid, points=points, labels=labels, mask_inputs=mask_prompt,
            multimask_output=multimask,
        )
        # [B=1, P=1, M, h, w] -> squeeze prompt dim.
        masks = masks[:, 0]
        iou = iou[:, 0]
        sam_tokens = sam_tokens[:, 0]
        obj_logits = obj_logits[:, 0]

        is_obj = obj_logits[:, 0] > 0  # [B]
        masks = jnp.where(is_obj[:, None, None, None], masks, NO_OBJ_SCORE)
        high_res = resize_bilinear(masks, (c.image_size, c.image_size))

        if multimask:
            best = jnp.argmax(iou, axis=-1)  # [B]
            low_res_mask = jnp.take_along_axis(masks, best[:, None, None, None], axis=1)[:, 0]
            high_res_mask = jnp.take_along_axis(high_res, best[:, None, None, None], axis=1)[:, 0]
            token = jnp.take_along_axis(sam_tokens, best[:, None, None], axis=1)[:, 0]
        else:
            low_res_mask = masks[:, 0]
            high_res_mask = high_res[:, 0]
            token = sam_tokens[:, 0]

        pointer = self.object_pointer_proj(token)
        lam = is_obj[:, None].astype(pointer.dtype)
        pointer = lam * pointer + (1 - lam) * self.no_object_pointer
        return low_res_mask, high_res_mask, pointer, obj_logits, iou

    # ------------------------------------------------------------------ #
    def _mask_as_output(self, pyramid, mask_inputs: jax.Array):
        """Treat a given binary mask as the output (reference
        sam2_base.py:251-330 _use_mask_as_output)."""
        c = self.config
        out_scale, out_bias = 20.0, -10.0
        high_res = mask_inputs.astype(jnp.float32) * out_scale + out_bias  # [B, S, S]
        g4 = c.image_size // 4
        low_res = resize_bilinear(high_res, (g4, g4))
        # Pointer from the SAM decoder fed with the downsampled mask prompt.
        mask_prompt = self.mask_downsample(
            (mask_inputs.astype(jnp.float32) * out_scale + out_bias)[..., None]
        ).transpose(0, 3, 1, 2)
        _, _, pointer, _, _ = self._sam_step(pyramid, None, None, mask_prompt, multimask=False)
        is_obj = jnp.any(mask_inputs.reshape(mask_inputs.shape[0], -1) > 0, axis=-1)
        lam = is_obj[:, None].astype(pointer.dtype)
        pointer = lam * pointer + (1 - lam) * self.no_object_pointer
        obj_logits = (out_scale * lam + out_bias)
        return low_res, high_res, pointer, obj_logits

    # ------------------------------------------------------------------ #
    def encode_memory(self, raw_s2: jax.Array, high_res_mask: jax.Array, obj_logits: jax.Array, binarize: jax.Array):
        """raw_s2 [B, G, G, 256] (no mem embedding), high_res_mask [B, S, S].
        -> [B, HW_mem, mem_dim] bf16-roundable memory tokens."""
        c = self.config
        m = c.mem
        prob = jax.nn.sigmoid(high_res_mask)
        hard = (high_res_mask > 0).astype(high_res_mask.dtype)
        mask_for_mem = jnp.where(binarize, hard, prob)
        mask_for_mem = mask_for_mem * m.sigmoid_scale + m.sigmoid_bias
        feats, _ = self.memory_encoder(raw_s2, mask_for_mem[..., None])
        if c.enable_occlusion_embedding:
            is_obj = (obj_logits[:, 0] > 0).astype(feats.dtype)
            feats = feats + (1.0 - is_obj)[:, None, None, None] * self.occlusion_embedding[0]
        return feats.reshape(feats.shape[0], -1, m.mem_dim)

    # ------------------------------------------------------------------ #
    def track_step(
        self,
        state: ObjectState,
        pyramid: list[jax.Array],
        raw_s2: jax.Array,  # [1, G, G, 256] un-projected stride-16 features
        pos_s2: jax.Array,  # [G, G, 256] sine positions of s2
        frame_idx: jax.Array,
        num_frames: jax.Array,
        points: jax.Array | None = None,
        labels: jax.Array | None = None,
        mask_inputs: jax.Array | None = None,
        is_init: bool = False,
        reverse: bool = False,
        multimask: bool | None = None,
    ):
        """One tracking step for one object. Returns (new_state, outputs)."""
        c = self.config
        m = c.mem
        g = c.mem_grid
        hw = g * g

        if mask_inputs is not None:
            pyr = [pyramid[0], pyramid[1], raw_s2 + self.image.no_memory_embedding[0, 0]]
            low_res, high_res, pointer, obj_logits = self._mask_as_output(pyr, mask_inputs)
            iou = jnp.ones((1, 1), jnp.float32)
        else:
            if is_init:
                pix = raw_s2 + self.image.no_memory_embedding[0, 0]
            else:
                memory, memory_pos, kv_mask, n_ptr = self._gather_memory(
                    state, frame_idx, num_frames.astype(jnp.float32), jnp.asarray(reverse)
                )
                curr = raw_s2.reshape(1, hw, m.hidden_size)
                curr_pos = pos_s2.reshape(1, hw, m.hidden_size)
                conditioned = self.memory_attention(
                    curr, curr_pos, memory, memory_pos, n_ptr, kv_mask
                )
                pix = conditioned.reshape(1, g, g, m.hidden_size)
            if multimask is None:
                n_pts = 0 if points is None else points.shape[2]
                multimask = (is_init or c.multimask_for_tracking) and n_pts <= 1
            low_res, high_res, pointer, obj_logits, iou = self._sam_step(
                [pyramid[0], pyramid[1], pix], points, labels, None, multimask
            )

        # Memory write.
        binarize = jnp.asarray(points is not None or mask_inputs is not None)
        mem_tokens = self.encode_memory(raw_s2, high_res, obj_logits, binarize)[0]

        if is_init:
            new_state = state._replace(
                maskmem=state.maskmem.at[0].set(mem_tokens),
                maskmem_frame=state.maskmem_frame.at[0].set(frame_idx),
                maskmem_valid=state.maskmem_valid.at[0].set(True),
                ptrs=state.ptrs.at[0].set(pointer[0]),
                ptr_frame=state.ptr_frame.at[0].set(frame_idx),
                ptr_valid=state.ptr_valid.at[0].set(True),
            )
        elif m.memory_temporal_stride == 1:
            slot = state.ring_pos
            pslot = state.ptr_ring_pos
            new_state = state._replace(
                maskmem=state.maskmem.at[slot].set(mem_tokens),
                maskmem_frame=state.maskmem_frame.at[slot].set(frame_idx),
                maskmem_valid=state.maskmem_valid.at[slot].set(True),
                ring_pos=jnp.where(slot + 1 >= m.num_maskmem, 1, slot + 1),
                ptrs=state.ptrs.at[pslot].set(pointer[0]),
                ptr_frame=state.ptr_frame.at[pslot].set(frame_idx),
                ptr_valid=state.ptr_valid.at[pslot].set(True),
                ptr_ring_pos=jnp.where(pslot + 1 >= m.max_obj_ptrs, 1, pslot + 1),
            )
        else:
            # Stride-r layout: slot 1 always holds the LAST frame; slots
            # 2..num_maskmem-1 ring over r-grid frames. The frame evicted
            # from the last slot is pushed into the ring iff it lies on the
            # r-grid (each frame passes through the last slot exactly once,
            # so the ring holds the newest num_maskmem-2 grid frames — the
            # set _gather_memory selects). Pointers are stride-independent.
            r = m.memory_temporal_stride
            old_mem = state.maskmem[1]
            old_frame = state.maskmem_frame[1]
            push = state.maskmem_valid[1] & (jnp.mod(old_frame, r) == 0)
            slot = state.ring_pos  # in [2, num_maskmem-1]
            tgt = jnp.where(push, slot, 1)  # non-push: no-op rewrite of slot 1
            maskmem = state.maskmem.at[tgt].set(old_mem)
            mframe = state.maskmem_frame.at[tgt].set(old_frame)
            mvalid = state.maskmem_valid.at[tgt].set(state.maskmem_valid[1])
            pslot = state.ptr_ring_pos
            new_state = state._replace(
                maskmem=maskmem.at[1].set(mem_tokens),
                maskmem_frame=mframe.at[1].set(frame_idx),
                maskmem_valid=mvalid.at[1].set(True),
                ring_pos=jnp.where(
                    push, jnp.where(slot + 1 >= m.num_maskmem, 2, slot + 1), slot
                ),
                ptrs=state.ptrs.at[pslot].set(pointer[0]),
                ptr_frame=state.ptr_frame.at[pslot].set(frame_idx),
                ptr_valid=state.ptr_valid.at[pslot].set(True),
                ptr_ring_pos=jnp.where(pslot + 1 >= m.max_obj_ptrs, 1, pslot + 1),
            )
        outputs = {
            "pred_masks": low_res,
            "high_res_masks": high_res,
            "object_pointer": pointer,
            "object_score_logits": obj_logits,
            "iou_scores": iou,
        }
        return new_state, outputs
