"""SAM2 predictors: image (set_image/predict) and video (init/add/propagate).

API counterparts of the vendored predictors (reference
segment-anything-2/sam2/sam2_image_predictor.py:83-463 and
sam2_video_predictor.py:40-957), TPU-native:

  * images resize+normalize on device; the backbone pyramid is cached per
    image/frame and every decode is one jit call;
  * video tracking runs ALL objects per frame in one vmapped track_step over
    the stacked ObjectState pytree (the reference loops objects serially,
    sam2_video_predictor.py:658);
  * box prompts become 2 corner points with labels (2, 3) like the reference
    video predictor (sam2_video_predictor.py:167-307);
  * multi-chip: pass device_mesh to shard the per-object axis of the vmapped
    track step over the mesh's "data" axis — M objects propagate in ~one
    object's wall time (object groups pad to a multiple of the axis size
    with no-prompt dummies; frame embeddings replicate; the joint
    non-overlap argmax gathers over ICI). The reference scales only by
    SLURM job sharding (SURVEY.md §5.8).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.models.sam2.model import Sam2Config, Sam2ImageModel, sam2_normalize
from freepose_tpu.models.sam2.video import ObjectState, Sam2VideoConfig, Sam2VideoModel, init_object_state
from freepose_tpu.ops.sampling import resize_bilinear


@partial(jax.jit, static_argnames=("size",))
def prepare_image(image: jax.Array, size: int) -> jax.Array:
    """[H, W, 3] uint8/float -> [1, 3, size, size] normalized. One jit
    program (eager transpose/resize/normalize chains cost a dispatch each)."""
    img = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        img = img / 255.0
    chw = img.transpose(2, 0, 1)
    resized = resize_bilinear(chw, (size, size))
    return sam2_normalize(resized[None])


@jax.jit
def apply_non_overlapping_constraints(pred_masks: jax.Array) -> jax.Array:
    """Keep only the highest-scoring object per pixel; suppressed scores clamp
    to <= -10 (sigmoid ~ 4.5e-5), reference sam2_base.py:811-829. Input
    [N, ..., H, W] logits with objects on the leading axis."""
    if pred_masks.shape[0] == 1:
        return pred_masks
    keep = jnp.argmax(pred_masks, axis=0, keepdims=True) == jnp.arange(
        pred_masks.shape[0]
    ).reshape(-1, *([1] * (pred_masks.ndim - 1)))
    return jnp.where(keep, pred_masks, jnp.minimum(pred_masks, -10.0))


def scale_coords(coords: jax.Array, orig_hw: tuple[int, int], size: int) -> jax.Array:
    """Pixel coords in the original image -> model input coords."""
    h, w = orig_hw
    scale = jnp.asarray([size / w, size / h], coords.dtype)
    return coords * scale


def _packbits_last(mask: jax.Array) -> jax.Array:
    """Pack a bool array's last axis into uint8 (np.unpackbits 'big' order:
    first pixel = MSB). Pads the width to a multiple of 8 with zeros."""
    w = mask.shape[-1]
    pad = (-w) % 8
    if pad:
        mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, pad)])
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    packed = mask.reshape(*mask.shape[:-1], -1, 8).astype(jnp.uint8) * weights
    return packed.sum(axis=-1, dtype=jnp.uint8)


def _unpackbits_last(packed: np.ndarray, width: int) -> np.ndarray:
    """Host-side inverse of `_packbits_last` -> bool array of given width."""
    return np.unpackbits(packed, axis=-1)[..., :width].astype(bool)


@partial(jax.jit, static_argnames=("orig_hw",))
def _upsample_logits(logits: jax.Array, orig_hw: tuple[int, int]) -> jax.Array:
    return resize_bilinear(logits, orig_hw)


@partial(jax.jit, static_argnames=("size",))
def _prepare_mask_prompts(masks: jax.Array, size: int) -> jax.Array:
    """[N, H, W] f32 binary masks -> [N, size, size] {0,1} f32 (bilinear
    resize then >= 0.5, the reference add_new_mask resample)."""
    return (resize_bilinear(masks, (size, size)) >= 0.5).astype(jnp.float32)


@partial(jax.jit, static_argnames=("orig_hw",))
def _upsample_threshold(logits: jax.Array, orig_hw: tuple[int, int]) -> jax.Array:
    """Upsample -> threshold, device output (no packing: consumed on device)."""
    return resize_bilinear(logits, orig_hw) > 0


@partial(jax.jit, static_argnames=("orig_hw",))
def _threshold_and_pack(logits: jax.Array, orig_hw: tuple[int, int]) -> jax.Array:
    """Upsample -> threshold -> bit-pack in ONE program (a single dispatch
    instead of an eager pad/reshape/mul/reduce chain per predict call)."""
    return _packbits_last(resize_bilinear(logits, orig_hw) > 0)


@partial(jax.jit, static_argnames=("orig_hw", "non_overlap", "binarize", "packbits"))
def postprocess_video_masks(
    low: jax.Array,  # [N, g4, g4] logits
    high: jax.Array,  # [N, S, S] logits at model resolution
    orig_hw: tuple[int, int],
    non_overlap: bool,
    binarize: bool,
    packbits: bool = False,
):
    """Per-frame output postprocess in ONE program: resize to the original
    resolution, optional cross-object suppression, optional on-device
    threshold. binarize=True ships bool masks to the host — 4× fewer bytes
    than f32 logits, which dominates per-frame cost on remote-attached TPUs
    (every consumer thresholds `> 0` anyway). packbits additionally packs the
    bool masks' width axis 8-per-uint8 on device (32× fewer bytes than f32
    total); the host unpacks with np.unpackbits, restoring identical bools."""
    high = resize_bilinear(high, orig_hw)
    if non_overlap and low.shape[0] > 1:
        low = apply_non_overlapping_constraints(low)
        high = apply_non_overlapping_constraints(high)
    if binarize:
        low, high = low > 0, high > 0
        if packbits:
            return _packbits_last(low), _packbits_last(high)
        return low, high
    return low, high


class Sam2ImagePredictor:
    def __init__(self, config: Sam2Config, params, image_size: int = 1024):
        self.model = Sam2ImageModel(config)
        self.params = jax.tree.map(jnp.asarray, params)
        self.image_size = image_size
        self._pyramid = None
        self._orig_hw = None

        @jax.jit
        def _embed(params, pixels):
            return self.model.apply({"params": params}, pixels, method=Sam2ImageModel.embed_image)

        @partial(jax.jit, static_argnames=("multimask",))
        def _decode(params, pyramid, points, labels, boxes, multimask):
            return self.model.apply(
                {"params": params}, pyramid, points=points, labels=labels, boxes=boxes,
                multimask_output=multimask, method=Sam2ImageModel.decode_masks,
            )

        self._embed_fn = _embed
        self._decode_fn = _decode

    def set_image(self, image: jax.Array) -> None:
        self._orig_hw = (int(image.shape[0]), int(image.shape[1]))
        pixels = prepare_image(jnp.asarray(image), self.image_size)
        self._pyramid, _ = self._embed_fn(self.params, pixels)

    def predict(
        self,
        point_coords: np.ndarray | None = None,
        point_labels: np.ndarray | None = None,
        box: np.ndarray | None = None,
        multimask_output: bool = True,
        return_logits: bool = False,
        fetch_low_res_logits: bool = True,
    ):
        """Returns (masks [P, M, H, W] at original res, iou [P, M],
        low_res_logits [P, M, g, g]).

        return_logits keeps the reference kwarg's meaning
        (sam2_image_predictor.py:179,264): False (default) thresholds the
        full-res masks to bool; True returns un-thresholded float logits at
        the original resolution. Binary masks are thresholded + bit-packed
        inside one jit program (8 px/byte over the wire) and unpacked on the
        host. fetch_low_res_logits=False skips the low-res logits'
        device->host fetch (P x M x 256 KB fp32) and returns None in their
        place — the proposal CLIs only consume the binary masks."""
        if self._pyramid is None:
            raise RuntimeError("call set_image first")
        pts, labels, boxes = self._scale_prompts(point_coords, point_labels, box)
        masks, iou, _, obj = self._decode_fn(self.params, self._pyramid, pts, labels, boxes, multimask_output)
        logits = masks[0]  # [P, M, g, g]
        if return_logits:
            full = np.asarray(_upsample_logits(logits, self._orig_hw))
        else:
            packed = _threshold_and_pack(logits, self._orig_hw)
            full = _unpackbits_last(np.asarray(packed), self._orig_hw[1])
        return full, np.asarray(iou[0]), np.asarray(logits) if fetch_low_res_logits else None

    def predict_device(
        self,
        point_coords=None,
        point_labels=None,
        box=None,
        multimask_output: bool = True,
    ):
        """`predict` with DEVICE-RESIDENT outputs: (bool masks [P, M, H, W]
        at the original resolution, iou [P, M]) as jax arrays — nothing
        fetched. Box prompts may be device arrays (e.g. straight from
        GroundingDinoDetector.detect_topk_device), so a whole per-frame
        proposal pipeline (detect -> masks -> retrieval) chains on device
        with one fetch at the very end."""
        if self._pyramid is None:
            raise RuntimeError("call set_image first")
        pts, labels, boxes = self._scale_prompts(point_coords, point_labels, box)
        masks, iou, _, _ = self._decode_fn(self.params, self._pyramid, pts, labels, boxes, multimask_output)
        full = _upsample_threshold(masks[0], self._orig_hw)
        return full, iou[0]

    def _scale_prompts(self, point_coords, point_labels, box):
        pts = labels = boxes = None
        if point_coords is not None:
            pts = scale_coords(jnp.asarray(point_coords, jnp.float32), self._orig_hw, self.image_size)
            pts = pts.reshape(1, -1, pts.shape[-2] if pts.ndim > 2 else pts.shape[0], 2)
            labels = jnp.asarray(point_labels, jnp.int32).reshape(1, pts.shape[1], -1)
        if box is not None:
            b = jnp.asarray(box, jnp.float32).reshape(1, -1, 4)
            bx = scale_coords(b.reshape(1, -1, 2, 2), self._orig_hw, self.image_size)
            boxes = bx.reshape(1, -1, 4)
        return pts, labels, boxes


class Sam2VideoPredictor:
    """Streaming multi-object video tracker with a batched functional state."""

    def __init__(
        self, config: Sam2VideoConfig, params, max_objects: int = 8, device_mesh=None
    ):
        self.config = config
        self.model = Sam2VideoModel(config)
        self.params = jax.tree.map(jnp.asarray, params)
        self.max_objects = max_objects
        self.mesh = device_mesh
        if device_mesh is not None:
            from freepose_tpu.parallel.mesh import replicate

            self.params = replicate(self.params, device_mesh)

        @jax.jit
        def _embed(params, pixels):
            return self.model.apply({"params": params}, pixels, method=Sam2VideoModel.embed_frame)

        @jax.jit
        def _prepare_embed(params, image):
            # resize+normalize+trunk in ONE program (one dispatch per frame).
            pixels = prepare_image.__wrapped__(image, self.config.image_size)
            return self.model.apply({"params": params}, pixels, method=Sam2VideoModel.embed_frame)

        self._prepare_embed_fn = _prepare_embed

        def _step(params, state, pyramid, raw_s2, pos_s2, frame_idx, num_frames, points, labels, is_init):
            return self.model.apply(
                {"params": params}, state=state, pyramid=pyramid, raw_s2=raw_s2, pos_s2=pos_s2,
                frame_idx=frame_idx, num_frames=num_frames, points=points, labels=labels,
                is_init=is_init, method=Sam2VideoModel.track_step,
            )

        # vmap over objects: state + prompts are per-object, frame shared.
        self._init_step = jax.jit(
            jax.vmap(partial(_step, is_init=True), in_axes=(None, 0, None, None, None, None, None, 0, 0))
        )

        def _step_mask(params, state, pyramid, raw_s2, pos_s2, frame_idx,
                       num_frames, mask_inputs):
            # Mask-prompt conditioning (reference add_new_mask ->
            # _use_mask_as_output, sam2_video_predictor.py:309-378 +
            # sam2_base.py:251-330): the given mask IS the frame's output and
            # seeds the conditioning memory.
            return self.model.apply(
                {"params": params}, state=state, pyramid=pyramid, raw_s2=raw_s2,
                pos_s2=pos_s2, frame_idx=frame_idx, num_frames=num_frames,
                mask_inputs=mask_inputs, is_init=True,
                method=Sam2VideoModel.track_step,
            )

        self._init_step_mask = jax.jit(
            jax.vmap(_step_mask, in_axes=(None, 0, None, None, None, None, None, 0))
        )
        self._track_step = jax.jit(
            jax.vmap(partial(_step, points=None, labels=None, is_init=False),
                     in_axes=(None, 0, None, None, None, None, None))
        )

        def _step_rev(params, state, pyramid, raw_s2, pos_s2, frame_idx, num_frames):
            return self.model.apply(
                {"params": params}, state=state, pyramid=pyramid, raw_s2=raw_s2, pos_s2=pos_s2,
                frame_idx=frame_idx, num_frames=num_frames, points=None, labels=None,
                is_init=False, reverse=True, method=Sam2VideoModel.track_step,
            )

        self._track_step_rev = jax.jit(
            jax.vmap(_step_rev, in_axes=(None, 0, None, None, None, None, None))
        )
        self._embed_fn = _embed

        @partial(jax.jit, static_argnames=(
            "sizes", "n_total", "reverse", "non_overlap", "binarize",
            "packbits", "orig_hw",
        ))
        def _chunk(params, states, frames, t0, num_frames, n_valid,
                   idx_arrays, *,
                   sizes, n_total, reverse, non_overlap, binarize, packbits,
                   orig_hw):
            """Propagate K frames in ONE program (lax.scan over frames):
            prepare+embed+track(all groups)+postprocess per frame, packed
            mask outputs stacked [K, ...]. One dispatch and one fetch per K
            frames instead of 3 dispatches + 2 copies per frame — on
            remote-attached TPUs the per-dispatch round trip (~30 ms) was
            the largest per-frame cost; numerics are identical to the
            per-frame path (same sub-programs, scanned).

            states: tuple of stacked per-group ObjectStates (padded to the
            mesh's data-axis size); idx_arrays/sizes: each group's object
            indices and true (pre-padding) size; frames: [K, H, W, 3].

            Tail runs shorter than the chunk size are PADDED to K by the
            caller (repeating the last frame) so every batch reuses ONE
            compiled program — remote-TPU compiles of this scan take minutes
            and the persistent cache cannot be relied on. `n_valid` masks
            the padded steps' state writes (their outputs are discarded on
            the host), so ring buffers/t_pos never see the padding."""
            step = -1 if reverse else 1
            track = self._track_step_rev if reverse else self._track_step
            size_px = self.config.image_size
            g4 = size_px // 4

            def body(carry, xs):
                states_c = carry
                i, frame = xs
                t = t0 + step * i
                is_pad = i >= n_valid
                pixels = prepare_image.__wrapped__(frame, size_px)
                pyramid, pos = self.model.apply(
                    {"params": params}, pixels, method=Sam2VideoModel.embed_frame
                )
                low_raw = jnp.full((n_total, g4, g4), -32.0, jnp.float32)
                high_raw = jnp.full((n_total, size_px, size_px), -32.0, jnp.float32)
                new_states = []
                for st, idx, size in zip(states_c, idx_arrays, sizes):
                    st2, out = track(params, st, pyramid, pyramid[2], pos[2],
                                     t, num_frames)
                    # Padded steps must not advance the memory state.
                    st2 = jax.tree.map(
                        lambda new, old: jnp.where(is_pad, old, new), st2, st
                    )
                    new_states.append(st2)
                    low_raw = low_raw.at[idx].set(
                        out["pred_masks"][:size, 0].astype(jnp.float32))
                    high_raw = high_raw.at[idx].set(
                        out["high_res_masks"][:size, 0].astype(jnp.float32))
                low_j, high_j = postprocess_video_masks(
                    low_raw, high_raw, orig_hw, non_overlap, binarize,
                    packbits=packbits,
                )
                return tuple(new_states), (low_j, high_j)

            xs = (jnp.arange(frames.shape[0]), frames)
            new_states, (lows, highs) = jax.lax.scan(body, states, xs)
            return new_states, lows, highs

        self._chunk_fn = _chunk

    # -------------------------------------------------------------- #
    def init_state(self, frames):
        """frames: [T, H, W, 3] uint8/float — a host np array (frames upload
        chunk-by-chunk with async prefetch) or a DEVICE jax array (e.g. the
        whole video pre-staged to HBM by a data loader: propagation then
        runs with zero per-chunk host uploads — on remote-attached chips the
        22 MB/chunk frame upload otherwise bounds throughput)."""
        t, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        return {
            "frames": frames,
            "orig_hw": (h, w),
            "num_frames": t,
            "states": None,  # stacked ObjectState, created on first add
            "n_objects": 0,
            "obj_ids": [],
            "prompts": {},  # obj_idx -> (frame_idx, points, labels)
            "pyramid_cache": {},
        }

    def _put_frame(self, frame):
        if self.mesh is None:
            return jax.device_put(frame)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(frame, NamedSharding(self.mesh, P()))

    def _frame_device(self, state, frame_idx: int):
        """Frame on device, via the async-prefetch cache when primed."""
        up = state.setdefault("upload_cache", {})
        arr = up.pop(frame_idx, None)
        if arr is None:
            arr = self._put_frame(state["frames"][frame_idx])
        state["last_frame_dev"] = arr  # device_batches mode crops from it
        return arr

    def _prefetch_frame(self, state, frame_idx: int) -> None:
        """Start the host->device copy of a coming frame so it overlaps with
        the current frame's compute (device_put is asynchronous)."""
        up = state.setdefault("upload_cache", {})
        if 0 <= frame_idx < state["num_frames"] and frame_idx not in up:
            up.clear()  # keep at most one frame in flight
            up[frame_idx] = self._put_frame(state["frames"][frame_idx])

    def _frame_pyramid(self, state, frame_idx: int):
        cache = state["pyramid_cache"]
        if frame_idx not in cache:
            cache.clear()  # single-frame LRU like the reference (:788-818)
            cache[frame_idx] = self._prepare_embed_fn(
                self.params, self._frame_device(state, frame_idx)
            )
        return cache[frame_idx]

    def add_new_points_or_box(
        self,
        state,
        frame_idx: int,
        obj_id: int,
        points: np.ndarray | None = None,
        labels: np.ndarray | None = None,
        box: np.ndarray | None = None,
    ):
        """Register an object with its prompt (video tracking starts at this
        frame). Box prompts become 2 corner points labelled (2, 3)."""
        h, w = state["orig_hw"]
        size = self.config.image_size
        if box is not None:
            pts = np.asarray(box, np.float64).reshape(2, 2)
            pts = pts * np.array([size / w, size / h])
            lbl = np.array([2, 3], np.int32)
        else:
            pts = np.asarray(points, np.float64).reshape(-1, 2) * np.array([size / w, size / h])
            lbl = np.asarray(labels, np.int32).reshape(-1)
        cap = self.config.max_point_prompts
        pad = cap - pts.shape[0]
        pts = np.pad(pts, ((0, pad), (0, 0)))
        lbl = np.pad(lbl, (0, pad), constant_values=-10)  # -10 = padding points
        if obj_id in state["obj_ids"]:
            # Correction: re-prompting an existing object replaces its prompt
            # — the next propagate_in_video rebuilds every object's state
            # from its prompt, so the new prompt frame becomes the object's
            # conditioning frame with fresh memory (the reference instead
            # KEEPS earlier conditioning frames and clears non-cond memory
            # around the correction, sam2_video_predictor.py:940-957; with a
            # single-cond-slot state, full re-conditioning is the exact
            # functional analogue for the correct-then-repropagate flow).
            idx = state["obj_ids"].index(obj_id)
        else:
            state["obj_ids"].append(obj_id)
            idx = len(state["obj_ids"]) - 1
        state["prompts"][idx] = (frame_idx, pts.astype(np.float32), lbl)
        state["n_objects"] = len(state["obj_ids"])
        return state

    def add_new_mask(self, state, frame_idx: int, obj_id: int, mask: np.ndarray):
        """Register an object with a binary MASK prompt (reference
        sam2_video_predictor.py:309-378): the mask resizes to model
        resolution (bilinear then >= 0.5, like the reference's antialiased
        interpolate + threshold) and conditions the object's init step
        through the mask-as-output path. Re-prompting replaces the object's
        prompt like add_new_points_or_box."""
        mask = np.asarray(mask)
        if mask.dtype != bool:
            mask = mask > 0
        if obj_id in state["obj_ids"]:
            idx = state["obj_ids"].index(obj_id)
        else:
            state["obj_ids"].append(obj_id)
            idx = len(state["obj_ids"]) - 1
        state["prompts"][idx] = (frame_idx, None, None, mask)
        state["n_objects"] = len(state["obj_ids"])
        return state

    def propagate_batched(
        self, state, start_frame_idx: int = 0, max_frames: int | None = None,
        reverse: bool = False, non_overlap_masks: bool = False, chunk: int = 8,
    ):
        """DEVICE-RESIDENT propagation: yields (ts, lows [K, N, g4, g4] bool,
        highs [K, N, H, W] bool, frames_dev [K, H, W, 3]) per batch — masks
        are binarized on device and NEVER fetched to the host, and the
        batch's uploaded frames are handed back so the fused mask -> bbox ->
        crop coupling (pipeline.proposals.proposals_from_masks_video) can
        build the refine chain's device-resident proposal crops with zero
        extra transfers. The per-frame host traffic of the coupled video
        pipeline reduces to the pose CSV row."""
        return self.propagate_in_video(
            state, start_frame_idx, max_frames, reverse, non_overlap_masks,
            binarize=True, chunk=chunk, device_batches=True,
        )

    def propagate_in_video(
        self, state, start_frame_idx: int = 0, max_frames: int | None = None,
        reverse: bool = False, non_overlap_masks: bool = False,
        binarize: bool = False, chunk: int = 8, device_batches: bool = False,
    ):
        """Generator over frames -> (frame_idx, obj_ids, low_res_masks
        [N, g4, g4], high_res_masks [N, H, W] at ORIGINAL resolution).

        binarize=True yields bool masks thresholded ON DEVICE (>0) instead of
        f32 logits — 4× less host transfer per frame; every pipeline consumer
        thresholds anyway.

        chunk>1 runs maximal prompt-free frame runs through a single scanned
        program (`chunk` frames per dispatch/fetch, numerically identical to
        the per-frame path); chunk=1 recovers frame-at-a-time dispatch.

        reverse=True propagates from the EARLIEST prompt frame towards frame
        0 (the reference's backward pass with its default start frame,
        sam2_video_predictor.py:644-726); temporal offsets flip sign inside
        track_step so memory ordering stays causal. Objects prompted on later
        frames are conditioned eagerly at their own prompt frame and tracked
        on every processed frame."""
        n = state["n_objects"]
        if n == 0:
            raise ValueError("no objects added")
        if device_batches and not binarize:
            raise ValueError("device_batches yields bool masks; set binarize=True")
        num_frames = state["num_frames"]
        end = num_frames if max_frames is None else min(num_frames, start_frame_idx + max_frames)

        # Objects group by (PROMPT FRAME, prompt KIND) — the reference
        # supports prompting different objects on different frames
        # (sam2_video_predictor.py:167) and with either point/box or mask
        # prompts (add_new_mask); each group is one vmapped stacked state,
        # stepped once per frame. Objects not yet prompted at frame t emit
        # no-object logits.
        groups: dict[tuple[int, str], list[int]] = {}
        for i in range(n):
            p = state["prompts"][i]
            kind = "mask" if len(p) > 3 and p[3] is not None else "pts"
            groups.setdefault((p[0], kind), []).append(i)
        prompt_frame = min(k[0] for k in groups)

        # Object groups pad to a multiple of the mesh's data-axis size so the
        # per-object axis shards evenly; dummies carry no-prompt labels and
        # their outputs are dropped before assembly.
        n_shards = self.mesh.shape["data"] if self.mesh is not None else 1

        def _shard_objects(tree):
            if self.mesh is None:
                return tree
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(self.mesh, P("data"))), tree
            )

        def group_prompts(idxs):
            cap = self.config.max_point_prompts
            pad = (-len(idxs)) % n_shards
            pts_l = [state["prompts"][i][1] for i in idxs] + [
                np.zeros((cap, 2), np.float32)
            ] * pad
            lbl_l = [state["prompts"][i][2] for i in idxs] + [
                np.full((cap,), -10, np.int32)
            ] * pad
            pts = jnp.asarray(np.stack(pts_l))[:, None, None]
            lbl = jnp.asarray(np.stack(lbl_l))[:, None, None]
            return _shard_objects((pts, lbl))

        def group_masks(idxs):
            size = self.config.image_size
            pad = (-len(idxs)) % n_shards
            ms = [np.asarray(state["prompts"][i][3], np.float32) for i in idxs]
            ms += [np.zeros_like(ms[0])] * pad
            resized = _prepare_mask_prompts(jnp.asarray(np.stack(ms)), size)
            return _shard_objects(resized[:, None])  # [n, 1, S, S]

        def init_group(key, idxs, pyramid, pos_pyr, t):
            if key[1] == "mask":
                mk = group_masks(idxs)
                return self._init_step_mask(
                    self.params, group_states(idxs), pyramid, pyramid[2],
                    pos_pyr[2], jnp.int32(t), jnp.int32(num_frames), mk,
                )
            pts, lbl = group_prompts(idxs)
            return self._init_step(
                self.params, group_states(idxs), pyramid, pyramid[2],
                pos_pyr[2], jnp.int32(t), jnp.int32(num_frames), pts, lbl,
            )

        def group_states(idxs):
            count = len(idxs) + (-len(idxs)) % n_shards
            return _shard_objects(
                jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[init_object_state(self.config) for _ in range(count)],
                )
            )

        def take_real(out_g, idxs):
            if (-len(idxs)) % n_shards == 0:
                return out_g
            return jax.tree.map(lambda a: a[: len(idxs)], out_g)

        live: dict[int, object] = {}  # prompt_frame -> stacked states

        if reverse:
            lo = -1 if max_frames is None else max(prompt_frame - max_frames, -1)
            order = range(prompt_frame, lo, -1)
            # Groups prompted AFTER the sweep's start frame condition eagerly
            # at their own prompt frame: once an object is prompted its cond
            # memory exists regardless of sweep direction, so the reverse
            # sweep (which starts at the EARLIEST prompt frame, the
            # reference's default start, sam2_video_predictor.py:668-670)
            # tracks every object on every processed frame
            # (sam2_video_predictor.py:698-712 runs the full batch).
            for key in sorted(groups):
                if key[0] == prompt_frame:
                    continue  # initialised inside the sweep at t == start
                pyramid_pf, pos_pf = self._frame_pyramid(state, key[0])
                live[key], _ = init_group(key, groups[key], pyramid_pf, pos_pf, key[0])
        else:
            order = range(prompt_frame, end)

        # Software pipeline: enqueue batch b's programs, start async
        # device->host copies, and yield batch b-1 (whose copies have had a
        # full batch of compute to land). Prompt-free frame runs go through
        # the scanned chunk program — one dispatch + one fetch per `chunk`
        # frames. Results are identical to the serial per-frame loop.
        step = -1 if reverse else 1
        chunk = max(1, int(chunk))
        order_list = list(order)
        pending = None  # (ts, low_dev, high_dev) — leading frame axis iff len(ts) > 1

        def _fetch(pl, ph):
            pl, ph = np.asarray(pl), np.asarray(ph)
            if binarize:
                g4 = self.config.image_size // 4
                pl = _unpackbits_last(pl, g4)
                ph = _unpackbits_last(ph, state["orig_hw"][1])
            return pl, ph

        def _drain(batch):
            ts, pl, ph = batch
            pl, ph = _fetch(pl, ph)
            if len(ts) == 1:
                yield ts[0], list(state["obj_ids"]), pl, ph
            else:
                for z, t_ in enumerate(ts):
                    yield t_, list(state["obj_ids"]), pl[z], ph[z]

        def _run_frame(t):
            """Per-frame path: prompt-group init + per-group steps."""
            pyramid, pos = self._frame_pyramid(state, t)
            raw_s2, pos_s2 = pyramid[2], pos[2]
            outs: list[tuple[list[int], dict]] = []
            for key in sorted(groups):
                if key[0] == t and key not in live:
                    idxs = groups[key]
                    live[key], out_g = init_group(key, idxs, pyramid, pos, t)
                    outs.append((idxs, take_real(out_g, idxs)))
            for key in sorted(live):
                if key[0] == t:
                    continue  # just initialised this frame
                step_fn = self._track_step_rev if reverse else self._track_step
                live[key], out_g = step_fn(
                    self.params, live[key], pyramid, raw_s2, pos_s2,
                    jnp.int32(t), jnp.int32(num_frames)
                )
                outs.append((groups[key], take_real(out_g, groups[key])))

            if len(outs) == 1 and len(outs[0][0]) == n:
                low_raw = outs[0][1]["pred_masks"][:, 0]
                high_raw = outs[0][1]["high_res_masks"][:, 0]
            else:
                # Assemble all objects in index order; objects whose prompt
                # frame has not arrived yet get no-object logits.
                l0 = outs[0][1]["pred_masks"][:, 0]
                h0 = outs[0][1]["high_res_masks"][:, 0]
                low_raw = jnp.full((n,) + l0.shape[1:], -32.0, l0.dtype)
                high_raw = jnp.full((n,) + h0.shape[1:], -32.0, h0.dtype)
                for idxs, out_g in outs:
                    ii = jnp.asarray(idxs)
                    low_raw = low_raw.at[ii].set(out_g["pred_masks"][:, 0])
                    high_raw = high_raw.at[ii].set(out_g["high_res_masks"][:, 0])
            # Resize + winner-take-all (reference sam2_base.py:811-829) +
            # optional threshold, one program. Binarized masks additionally
            # bitpack on device (8 pixels/byte) and unpack on the host right
            # before the yield — same bool arrays, 8x less wire transfer.
            return postprocess_video_masks(
                low_raw, high_raw,
                state["orig_hw"], non_overlap_masks, binarize,
                packbits=binarize and not device_batches,
            )

        def _upload_chunk(ts):
            """Start the (async) device upload of a multi-frame batch. Runs
            shorter than `chunk` pad to the full chunk length (repeating the
            last frame; the program masks their state writes and the host
            discards their outputs) so every batch hits the SAME compiled
            executable — each distinct K would otherwise compile its own
            multi-minute program on a remote TPU. Device-resident videos
            slice/flip/pad on device instead (no host traffic at all)."""
            src = state["frames"]
            if isinstance(src, jax.Array):
                if step == 1:
                    fr = jax.lax.slice_in_dim(src, ts[0], ts[-1] + 1)
                else:
                    fr = jnp.flip(jax.lax.slice_in_dim(src, ts[-1], ts[0] + 1), 0)
                if len(ts) < chunk:
                    pad = jnp.repeat(fr[-1:], chunk - len(ts), axis=0)
                    fr = jnp.concatenate([fr, pad], axis=0)
                return self._put_frame(fr)
            if step == 1:
                frames_np = src[ts[0] : ts[-1] + 1]
            else:
                frames_np = src[ts[-1] : ts[0] + 1][::-1]
            frames_np = np.ascontiguousarray(frames_np)
            if len(ts) < chunk:
                pad = np.repeat(frames_np[-1:], chunk - len(ts), axis=0)
                frames_np = np.concatenate([frames_np, pad], axis=0)
            return self._put_frame(frames_np)

        def _run_chunk(ts, frames_dev):
            """Scanned multi-frame path over the current live groups."""
            order_pfs = sorted(live)
            new_states, lows, highs = self._chunk_fn(
                self.params, tuple(live[pf] for pf in order_pfs), frames_dev,
                jnp.int32(ts[0]), jnp.int32(num_frames), jnp.int32(len(ts)),
                tuple(jnp.asarray(groups[pf]) for pf in order_pfs),
                sizes=tuple(len(groups[pf]) for pf in order_pfs), n_total=n,
                reverse=reverse, non_overlap=non_overlap_masks,
                binarize=binarize, packbits=binarize and not device_batches,
                orig_hw=state["orig_hw"],
            )
            for pf, st in zip(order_pfs, new_states):
                live[pf] = st
            return lows[: len(ts)], highs[: len(ts)]

        # Batch plan, computed upfront (prompt frames and length-1 runs are
        # singletons via the per-frame path; maximal prompt-free runs go
        # through the scanned chunk program): knowing the plan lets batch
        # b+1's frame upload start (async device_put) while batch b's
        # program computes — the 8-frame upload is ~1 s through a remote
        # tunnel and fully hides behind the batch's device time.
        plan: list[list[int]] = []
        prompt_frames = {k[0] for k in groups}
        live_frames = {k[0] for k in live}
        i = 0
        while i < len(order_list):
            t = order_list[i]
            if (t in prompt_frames and t not in live_frames) or chunk == 1 or not live_frames:
                plan.append([t])
                if t in prompt_frames:
                    live_frames.add(t)
                i += 1
            else:
                j = i
                while (
                    j < len(order_list) and j - i < chunk
                    and not (order_list[j] in prompt_frames and order_list[j] not in live_frames)
                ):
                    j += 1
                plan.append(order_list[i:j])
                i = j

        uploads: dict[int, object] = {}
        for bi, ts in enumerate(plan):
            if len(ts) > 1 and bi not in uploads:
                uploads[bi] = _upload_chunk(ts)
            frames_b = None
            if len(ts) == 1:
                low_j, high_j = _run_frame(ts[0])
                if device_batches:
                    frames_b = state["last_frame_dev"][None]
                    low_j, high_j = low_j[None], high_j[None]
                batch = (ts, low_j, high_j)
            else:
                frames_b = uploads.pop(bi)
                lows, highs = _run_chunk(ts, frames_b)
                frames_b = frames_b[: len(ts)]
                batch = (ts, lows, highs)
            # Prefetch the next multi-frame batch's frames behind this
            # batch's compute.
            if bi + 1 < len(plan) and len(plan[bi + 1]) > 1:
                uploads[bi + 1] = _upload_chunk(plan[bi + 1])
            if device_batches:
                # Device-resident mode: hand the batch (and its uploaded
                # frames) straight to the consumer — nothing is fetched.
                yield ts, batch[1], batch[2], frames_b
                continue
            for a in batch[1:]:
                try:
                    a.copy_to_host_async()
                except Exception:
                    pass
            if pending is not None:
                yield from _drain(pending)
            pending = batch
        if pending is not None:
            yield from _drain(pending)
