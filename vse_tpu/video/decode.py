"""Host video decode -> device-ready frame batches.

Replaces the reference's three decode paths — the driver's per-frame
`cv2.VideoCapture.read()` loop (reference backend/main.py:228-253), the OCR
child's re-decode-by-seek producer (reference backend/tools/subtitle_ocr.py:
164-208), and the external scanner binary's own decoder (reference
backend/main.py:378-505) — with ONE decode pass: a reader thread pushes
frames into the native C++ ring buffer (vse_tpu/native/framebuffer.cpp) and
the consumer pops contiguous, fixed-size batches ready for
`jax.device_put`. Frames are decoded exactly once and never re-sought.
"""

from __future__ import annotations

import ctypes
import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is baked into the image
    cv2 = None


@dataclass
class VideoMeta:
    path: str
    fps: float
    frame_count: int
    height: int
    width: int

    @property
    def duration_ms(self) -> float:
        return self.frame_count / self.fps * 1000.0 if self.fps else 0.0


def probe(path: str) -> VideoMeta:
    """Read video metadata (reference backend/main.py:60-71 reads
    fps/frame_count/size at extractor init)."""
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {path}")
        return VideoMeta(
            path=path,
            fps=float(cap.get(cv2.CAP_PROP_FPS)) or 25.0,
            frame_count=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        )
    finally:
        cap.release()


def ffmpeg_exe() -> Optional[str]:
    """The ffmpeg binary ($VSE_FFMPEG override, else PATH), or None.

    Backs the `Decoder.FFMPEG` config knob (reference
    backend/main.py:491-495 passes --open_video_ffmpeg to its scanner)."""
    env = os.environ.get("VSE_FFMPEG")
    if env and os.path.exists(env):
        return env
    import shutil

    return shutil.which("ffmpeg")


class _FFmpegCapture:
    """cv2.VideoCapture-compatible subset over an ffmpeg rawvideo pipe.

    Implements exactly the surface `FrameStream._decode_loop` uses: read(),
    get(CAP_PROP_POS_MSEC), set(CAP_PROP_POS_FRAMES) before the first read,
    release(). Frames come out BGR (like cv2) so the caller's RGB flip is
    uniform across backends. Timestamps are frame_no/fps (CFR assumption —
    the same arithmetic cv2 reports for the containers the reference
    processes)."""

    def __init__(self, path: str, meta: "VideoMeta"):
        self.path = path
        self.meta = meta
        self._frame_bytes = meta.height * meta.width * 3
        self._proc = None
        self._pos = 0  # 0-based index of the next frame read() returns

    def _spawn(self) -> None:
        import subprocess

        exe = ffmpeg_exe()
        if exe is None:
            raise FileNotFoundError("ffmpeg binary not found")
        args = [exe, "-nostdin", "-loglevel", "error"]
        if self._pos > 0 and self.meta.fps:
            args += ["-ss", f"{self._pos / self.meta.fps:.6f}"]
        args += [
            "-i", self.path, "-f", "rawvideo", "-pix_fmt", "bgr24", "pipe:1",
        ]
        self._proc = subprocess.Popen(
            args,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            bufsize=self._frame_bytes * 4,
        )

    def isOpened(self) -> bool:
        return True

    def set(self, prop, value) -> bool:
        if prop == cv2.CAP_PROP_POS_FRAMES and self._proc is None:
            self._pos = int(value)
            return True
        return False

    def get(self, prop) -> float:
        if prop == cv2.CAP_PROP_POS_MSEC:
            # cv2 semantics: after read() this is the NEXT frame's timestamp
            return self._pos / self.meta.fps * 1000.0 if self.meta.fps else 0.0
        if prop == cv2.CAP_PROP_FPS:
            return self.meta.fps
        if prop == cv2.CAP_PROP_FRAME_COUNT:
            return float(self.meta.frame_count)
        return 0.0

    def read(self):
        if self._proc is None:
            self._spawn()
        out = self._proc.stdout
        chunks, need = [], self._frame_bytes
        while need:
            b = out.read(need)
            if not b:
                return False, None
            chunks.append(b)
            need -= len(b)
        frame = np.frombuffer(b"".join(chunks), np.uint8).reshape(
            self.meta.height, self.meta.width, 3
        )
        self._pos += 1
        return True, frame

    def release(self) -> None:
        if self._proc is not None:
            try:
                self._proc.stdout.close()
                self._proc.terminate()
                self._proc.wait(timeout=5)
            except Exception:
                try:
                    self._proc.kill()
                except Exception:
                    pass
            self._proc = None


@dataclass
class FrameBatch:
    """A contiguous stack of decoded frames plus their metadata."""

    frames: np.ndarray  # [B, H, W, 3] uint8 RGB
    frame_nos: np.ndarray  # [B] int64, 1-based like the reference's counter
    ts_ms: np.ndarray  # [B] float64 capture timestamps
    valid: np.ndarray  # [B] bool — False rows are padding


class _NativeRing:
    """ctypes wrapper over the C++ ring buffer."""

    def __init__(self, slot_bytes: int, n_slots: int):
        so = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "native", "libvse_native.so",
        )
        self.lib = ctypes.CDLL(so)
        self.lib.vse_ring_create.restype = ctypes.c_void_p
        self.lib.vse_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        self.lib.vse_ring_push.restype = ctypes.c_int
        self.lib.vse_ring_push.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_int64, ctypes.c_double,
        ]
        self.lib.vse_ring_pop_batch.restype = ctypes.c_int
        self.lib.vse_ring_pop_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ]
        self.lib.vse_ring_close.argtypes = [ctypes.c_void_p]
        self.lib.vse_ring_destroy.argtypes = [ctypes.c_void_p]
        self.slot_bytes = slot_bytes
        self.handle = ctypes.c_void_p(
            self.lib.vse_ring_create(slot_bytes, n_slots)
        )

    def push(self, frame: np.ndarray, frame_no: int, ts_ms: float) -> bool:
        buf = np.ascontiguousarray(frame)
        rc = self.lib.vse_ring_push(
            self.handle,
            buf.ctypes.data_as(ctypes.c_char_p),
            buf.nbytes,
            frame_no,
            ts_ms,
        )
        return rc == 0

    def pop_batch(self, batch_n: int, frame_shape) -> Optional[FrameBatch]:
        dst = np.empty((batch_n,) + tuple(frame_shape), np.uint8)
        nos = (ctypes.c_int64 * batch_n)()
        tss = (ctypes.c_double * batch_n)()
        got = self.lib.vse_ring_pop_batch(
            self.handle, dst.ctypes.data_as(ctypes.c_void_p), batch_n, nos, tss
        )
        if got == 0:
            return None
        if got < batch_n:
            dst[got:] = 0  # padding rows must be deterministic zeros
        valid = np.zeros((batch_n,), bool)
        valid[:got] = True
        return FrameBatch(
            frames=dst,
            frame_nos=np.array(nos[:batch_n], np.int64),
            ts_ms=np.array(tss[:batch_n], np.float64),
            valid=valid,
        )

    def close(self):
        self.lib.vse_ring_close(self.handle)

    def __del__(self):
        try:
            self.lib.vse_ring_destroy(self.handle)
        except Exception:
            pass


_native_build_attempted = False


def native_available() -> bool:
    """The C++ ring buffer library, self-building on first use (the .so is
    a build artifact, not committed; `make` in vse_tpu/native compiles it
    in ~1s with the baked-in g++)."""
    global _native_build_attempted
    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
    )
    so = os.path.join(native_dir, "libvse_native.so")
    if os.path.exists(so):
        return True
    if not _native_build_attempted:
        _native_build_attempted = True
        import subprocess

        try:
            subprocess.run(
                ["make"], cwd=native_dir, capture_output=True, timeout=60
            )
        except Exception:
            pass
    return os.path.exists(so)


class FrameStream:
    """Single-pass decoded frame stream with batch assembly.

    Iterates `FrameBatch`es of a fixed size (last batch padded). `stride`
    implements fps-mode sampling: emit one frame, skip stride-1 (the
    reference's `fps // extractFrequency` skip loop, backend/main.py:246-252).
    """

    def __init__(
        self,
        path: str,
        batch_size: int = 8,
        stride: int = 1,
        rgb: bool = True,
        queue_depth: int = 64,
        use_native_ring: bool = True,
        start_frame: int = 0,
        end_frame: Optional[int] = None,
        decoder: str = "opencv",
    ):
        self.meta = probe(path)
        self.path = path
        self.batch_size = batch_size
        self.stride = max(1, stride)
        self.rgb = rgb
        self.queue_depth = queue_depth
        self.start_frame = start_frame
        self.end_frame = end_frame
        self._use_native = use_native_ring and native_available()
        self.frame_to_ms: dict = {}
        self.decoder = getattr(decoder, "value", decoder)  # Decoder enum or str
        if self.decoder == "ffmpeg" and ffmpeg_exe() is None:
            import warnings

            warnings.warn(
                "Decoder.FFMPEG requested but no ffmpeg binary found; "
                "falling back to OpenCV decode",
                stacklevel=2,
            )
            self.decoder = "opencv"

    def _open_capture(self):
        if self.decoder == "ffmpeg":
            return _FFmpegCapture(self.path, self.meta)
        return cv2.VideoCapture(self.path)

    def _decode_loop(self, push, close):
        cap = self._open_capture()
        try:
            frame_no = 0
            if self.start_frame > 0:
                cap.set(cv2.CAP_PROP_POS_FRAMES, self.start_frame)
                frame_no = self.start_frame
            while True:
                ret, frame = cap.read()
                if not ret:
                    break
                frame_no += 1  # 1-based, like the reference's counter
                if self.end_frame is not None and frame_no > self.end_frame:
                    break
                ts = float(cap.get(cv2.CAP_PROP_POS_MSEC))
                self.frame_to_ms[frame_no] = ts
                if (frame_no - self.start_frame - 1) % self.stride == 0:
                    if self.rgb:
                        frame = frame[:, :, ::-1]  # BGR -> RGB
                    if not push(frame, frame_no, ts):
                        break
        finally:
            cap.release()
            close()

    def __iter__(self) -> Iterator[FrameBatch]:
        shape = (self.meta.height, self.meta.width, 3)
        if self._use_native:
            ring = _NativeRing(
                slot_bytes=int(np.prod(shape)), n_slots=self.queue_depth
            )
            t = threading.Thread(
                target=self._decode_loop, args=(ring.push, ring.close),
                daemon=True,
            )
            t.start()
            while True:
                batch = ring.pop_batch(self.batch_size, shape)
                if batch is None:
                    break
                yield batch
            t.join()
        else:
            q: "queue.Queue" = queue.Queue(maxsize=self.queue_depth)

            def push(frame, no, ts):
                q.put((np.ascontiguousarray(frame), no, ts))
                return True

            def close():
                q.put(None)

            t = threading.Thread(
                target=self._decode_loop, args=(push, close), daemon=True
            )
            t.start()
            pending: List[Tuple[np.ndarray, int, float]] = []
            done = False
            while not done or pending:
                while not done and len(pending) < self.batch_size:
                    item = q.get()
                    if item is None:
                        done = True
                        break
                    pending.append(item)
                if not pending:
                    break
                take = pending[: self.batch_size]
                pending = pending[self.batch_size :]
                frames = np.zeros((self.batch_size,) + shape, np.uint8)
                nos = np.zeros((self.batch_size,), np.int64)
                tss = np.zeros((self.batch_size,), np.float64)
                valid = np.zeros((self.batch_size,), bool)
                for i, (f, no, ts) in enumerate(take):
                    frames[i] = f
                    nos[i] = no
                    tss[i] = ts
                    valid[i] = True
                yield FrameBatch(frames, nos, tss, valid)
            t.join()


def read_frames(
    path: str, frame_nos: List[int], rgb: bool = True, seek_gap: int = 300
) -> List[Optional[np.ndarray]]:
    """Read a set of frames in ONE pass (sorted internally, results returned
    in the caller's order). Small gaps are skipped with cheap `grab()`s;
    only gaps larger than `seek_gap` frames use a container seek — replaces
    the O(spans) random re-seeks of per-span `read_frame` calls (keyframe
    mode pass 2), which contradicted the single-pass decode design."""
    order = np.argsort(frame_nos, kind="stable")
    out: List[Optional[np.ndarray]] = [None] * len(frame_nos)
    cap = cv2.VideoCapture(path)
    try:
        pos = 0  # next frame index the decoder will return (0-based)
        for oi in order:
            target = max(0, int(frame_nos[oi]))
            if target < pos:
                cap.set(cv2.CAP_PROP_POS_FRAMES, target)
                pos = target
            elif target - pos > seek_gap:
                cap.set(cv2.CAP_PROP_POS_FRAMES, target)
                pos = target
            while pos < target:
                if not cap.grab():
                    break
                pos += 1
            ret, frame = cap.read()
            if not ret:
                continue
            pos += 1
            out[oi] = frame[:, :, ::-1] if rgb else frame
    finally:
        cap.release()
    return out


def read_frame(path: str, frame_no: int = 0, rgb: bool = True) -> Optional[np.ndarray]:
    """Random-access single frame (for previews/filters)."""
    cap = cv2.VideoCapture(path)
    try:
        if frame_no > 0:
            cap.set(cv2.CAP_PROP_POS_FRAMES, frame_no)
        ret, frame = cap.read()
        if not ret:
            return None
        return frame[:, :, ::-1] if rgb else frame
    finally:
        cap.release()
