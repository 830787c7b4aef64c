"""Video frame loading: eager array or background-thread streaming.

Counterpart of the vendored SAM2 loaders (reference
segment-anything-2/sam2/utils/misc.py:92-214): `load_frame_dir` is the eager
[T, H, W, 3] loader; `AsyncVideoFrameLoader` decodes JPEG/PNG frames on a
daemon thread ahead of consumption so host decode overlaps device compute
(SURVEY §2.7 "async I/O overlap"). Frames stay uint8 RGB — resize/normalize
happens on device in the consumers (predictor.prepare_image), unlike the
reference which normalizes on host."""
from __future__ import annotations

import dataclasses
import threading
from pathlib import Path

import numpy as np

_EXTS = (".jpg", ".jpeg", ".png")

FRAME_BUCKET = 128


@dataclasses.dataclass(frozen=True)
class StagedVideo:
    """A whole video resident in HBM at a STATIC frame bucket.

    `frames` is [B, H, W, 3] uint8 on device with B a multiple of
    FRAME_BUCKET (rows >= n repeat the last real frame); `n` is the true
    frame count. Consumers slice/gather chunks ON DEVICE, so per-chunk work
    costs zero host->device bytes and — because B is bucketed — every video
    length <= B reuses the same compiled programs (a per-video-length shape
    costs a fresh remote compile on tunneled TPU sessions)."""

    frames: object  # jax.Array [B, H, W, 3] uint8
    n: int

    def __len__(self) -> int:
        return self.n

    def prefix(self, n: int) -> "StagedVideo":
        """A logical prefix sharing the SAME device buffer (same programs)."""
        return dataclasses.replace(self, n=min(n, self.n))


def stage_frames_hbm(frames: np.ndarray, bucket: int = FRAME_BUCKET) -> StagedVideo:
    """ONE host->device upload of the whole video, padded to the frame
    bucket with repeats of the last frame (matching the repeat-pad the
    chunked consumers use for partial tails)."""
    import jax

    n = len(frames)
    if n == 0:
        raise ValueError("stage_frames_hbm: empty frame array")
    b = -(-n // bucket) * bucket
    if b > n:
        frames = np.concatenate([frames, np.repeat(frames[-1:], b - n, axis=0)])
    return StagedVideo(jax.block_until_ready(jax.device_put(frames)), n)


def list_frame_paths(video_dir: str | Path) -> list[Path]:
    paths: list[Path] = []
    for ext in _EXTS:
        paths.extend(Path(video_dir).glob(f"*{ext}"))
    return sorted(paths)


def _decode(path: Path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def load_frame_dir(video_dir: str | Path) -> np.ndarray:
    """[T, H, W, 3] uint8 — eager (small videos / tests)."""
    paths = list_frame_paths(video_dir)
    if not paths:
        raise FileNotFoundError(f"no frames under {video_dir}")
    return np.stack([_decode(p) for p in paths])


class AsyncVideoFrameLoader:
    """Indexable lazy frame list with a background decode thread.

    Frame 0 decodes synchronously (it sets video_height/width and is where
    prompting happens, reference misc.py:123-125); the rest stream in order
    on a daemon thread. Exceptions in the thread re-raise at the next access
    (reference misc.py:138-141)."""

    def __init__(self, video_dir: str | Path):
        self.paths = list_frame_paths(video_dir)
        if not self.paths:
            raise FileNotFoundError(f"no frames under {video_dir}")
        self._frames: list[np.ndarray | None] = [None] * len(self.paths)
        self._lock = threading.Lock()
        self.exception: BaseException | None = None

        first = self[0]
        self.video_height, self.video_width = first.shape[:2]

        def _worker():
            try:
                for i in range(len(self.paths)):
                    self._ensure(i)
            except BaseException as e:  # surfaced on next __getitem__
                self.exception = e

        self._thread = threading.Thread(target=_worker, daemon=True)
        self._thread.start()

    def _ensure(self, index: int) -> np.ndarray:
        frame = self._frames[index]
        if frame is None:
            frame = _decode(self.paths[index])
            with self._lock:
                if self._frames[index] is None:
                    self._frames[index] = frame
                frame = self._frames[index]
        return frame

    def __getitem__(self, index: int) -> np.ndarray:
        if self.exception is not None:
            raise RuntimeError("failure in frame loading thread") from self.exception
        return self._ensure(index)

    def __len__(self) -> int:
        return len(self.paths)

    @property
    def shape(self):  # duck-type the eager [T, H, W, 3] array
        return (len(self.paths), self.video_height, self.video_width, 3)

    def join(self) -> None:
        self._thread.join()
