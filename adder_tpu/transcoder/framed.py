"""Framed (conventional video) -> ADDER source.

ref: adder-codec-rs/src/transcoder/source/framed.rs. The reference decodes
via ffmpeg (video-rs); here cv2.VideoCapture provides frames (BGR, matching
the reference's channel order), with an array-backed variant for
deterministic tests and batch pipelines.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.types import Mode, PlaneSize, SourceCamera, TimeMode
from .video import SourceError, Video


# golden-pinned video-rs-quirk conversion (utils/cv.py documents both)
from ..utils.cv import handle_color_videors as handle_color  # noqa: F401


class FramedArray:
    """Array-backed framed source: (T, H, W, C) uint8 frames.

    The deterministic core used by tests, benchmarks, and the mp4 wrapper.
    API mirrors Framed (ref: framed.rs:22-280) minus the decoder.
    """

    def __init__(
        self,
        frames: np.ndarray,
        source_fps: float = 30.0,
        chunk_frames: int = 8,
    ):
        frames = np.asarray(frames)
        if frames.ndim == 3:
            frames = frames[..., None]
        self.frames = frames.astype(np.uint8)
        self.source_fps = source_fps
        T, H, W, C = self.frames.shape
        plane = PlaneSize(W, H, C)
        self.video = Video(plane, Mode.FramePerfect, chunk_frames=chunk_frames)
        self.frame_idx = 0
        self.frame_idx_start = 0

    # -- builder methods (ref: framed.rs:94-111, VideoBuilder impl) --

    def frame_start(self, frame_idx_start: int) -> "FramedArray":
        if frame_idx_start >= len(self.frames):
            raise SourceError(f"start frame {frame_idx_start} out of bounds")
        self.frame_idx = self.frame_idx_start = frame_idx_start
        return self

    def auto_time_parameters(
        self, ref_time: int, delta_t_max: int, time_mode: Optional[TimeMode] = None
    ) -> "FramedArray":
        """tps = ref_time * fps (ref: framed.rs:94-111)."""
        if delta_t_max % ref_time != 0:
            raise SourceError("delta_t_max must be a multiple of ref_time")
        tps = int(ref_time * self.source_fps)
        self.video.time_parameters(tps, ref_time, delta_t_max, time_mode)
        return self

    def time_parameters(self, tps, ref_time, delta_t_max, time_mode=None):
        if delta_t_max % ref_time != 0:
            raise SourceError("delta_t_max must be a multiple of ref_time")
        self.video.time_parameters(tps, ref_time, delta_t_max, time_mode)
        return self

    def crf(self, crf: int) -> "FramedArray":
        self.video.update_crf(crf)
        return self

    def quality_manual(self, *args) -> "FramedArray":
        self.video.update_quality_manual(*args)
        return self

    def write_out(self, source_camera, time_mode, pixel_multi_mode,
                  adu_interval, encoder_type, encoder_options, write,
                  **kwargs):
        self.video.write_out(
            source_camera, time_mode, pixel_multi_mode, adu_interval,
            encoder_type, encoder_options, write, **kwargs,
        )
        return self

    def detect_features(self, detect, show_features=None):
        self.video.detect_features(detect, show_features)
        return self

    def get_ref_time(self):
        return self.video.ref_time

    def get_video_ref(self):
        return self.video

    def get_video_mut(self):
        return self.video

    # -- Source trait (ref: video.rs:1419-1442) --

    def consume(self):
        """One input interval (ref: framed.rs:127-157)."""
        if self.frame_idx >= len(self.frames):
            raise EOFError("source exhausted")
        frame = self.frames[self.frame_idx]
        self.frame_idx += 1
        return self.video.integrate_matrix(frame, float(self.video.ref_time))

    def consume_batch(self, max_frames: Optional[int] = None):
        """Device-chunked fast path: transcode up to chunk_frames frames."""
        t = self.video.chunk_frames if max_frames is None else max_frames
        if self.frame_idx >= len(self.frames):
            raise EOFError("source exhausted")
        chunk = self.frames[self.frame_idx : self.frame_idx + t]
        self.frame_idx += len(chunk)
        return self.video.integrate_matrix_batch(
            chunk, float(self.video.ref_time)
        )

    def get_running_input_bitrate(self) -> float:
        v = self.video
        return v.tps / v.ref_time * v.plane.volume() * 8.0


class Framed(FramedArray):
    """mp4/video-file framed source (ref: framed.rs:42-122).

    Decodes the whole clip up front into the array-backed source. For long
    videos use `FramedStream` (threaded lazy chunk decode overlapping the
    device).

    `decoder` selects the decode stage: "ffmpeg" binds the system
    libavcodec/libswscale (native/videodec.cpp) — the same libraries the
    reference's video-rs wraps, so RGB24 bytes (and thus the transcoded
    event stream) match the Rust implementation bit-exactly; "cv2" uses
    OpenCV (its YUV->BGR arithmetic differs by +-1 on a few percent of
    pixels); "auto" (default) prefers ffmpeg and falls back to cv2.
    """

    def __init__(self, input_path: str, color_input: bool, scale: float = 1.0,
                 chunk_frames: int = 8, max_frames: Optional[int] = None,
                 decoder: str = "auto"):
        from . import ffdec

        if decoder not in ("auto", "ffmpeg", "cv2"):
            raise ValueError(f"unknown decoder {decoder!r}")
        use_ffmpeg = decoder == "ffmpeg" or (
            decoder == "auto" and ffdec.available()
        )
        if use_ffmpeg:
            from ..utils.cv import handle_color_rgb_videors

            rgb, fps = ffdec.decode_frames(
                str(input_path), scale=scale, max_frames=max_frames
            )
            frames = [handle_color_rgb_videors(f, color_input) for f in rgb]
            fps = fps or 30.0
        else:
            import cv2

            cap = cv2.VideoCapture(str(input_path))
            if not cap.isOpened():
                raise SourceError(f"could not open {input_path}")
            fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
            frames = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if scale != 1.0:
                    h, w = frame.shape[:2]
                    frame = cv2.resize(
                        frame,
                        (int(w * scale), int(h * scale)),
                        interpolation=cv2.INTER_AREA,
                    )
                frames.append(handle_color(frame, color_input))
                if max_frames is not None and len(frames) >= max_frames:
                    break
            cap.release()
        if not frames:
            raise SourceError(f"no frames decoded from {input_path}")
        super().__init__(
            np.stack(frames), source_fps=fps, chunk_frames=chunk_frames
        )
        self.color_input = color_input
        self.scale = scale
        self.decoder = "ffmpeg" if use_ffmpeg else "cv2"


class FramedStream:
    """Streaming framed source: frames decode on a worker thread with a
    bounded prefetch queue, overlapping decode with device integration,
    and chunks ride Video's submit/collect pipelining (one chunk stays in
    flight across consume_batch calls) — the P2/P4 treatment the Davis
    sources got (ref: simulproc.rs:166-218 pipelines transcode and write;
    davis.rs:626-632 threads the reconstructor).

    Same builder/Source API as FramedArray. Contract difference from the
    eager classes: consume_batch SUBMITS the next chunk and returns the
    events of the previously pipelined chunk (EventArray.empty() on the
    first call); every event still reaches the encoder in reference
    order, so written `.adder` bytes are identical to FramedArray's
    (pinned by tests). EOFError flushes the pipeline first."""

    def __init__(self, input_path: str, color_input: bool, scale: float = 1.0,
                 chunk_frames: int = 8, max_frames: Optional[int] = None,
                 decoder: str = "auto", prefetch_chunks: int = 3):
        import queue
        import threading

        from . import ffdec

        if decoder not in ("auto", "ffmpeg", "cv2"):
            raise ValueError(f"unknown decoder {decoder!r}")
        use_ffmpeg = decoder == "ffmpeg" or (
            decoder == "auto" and ffdec.available()
        )
        self.decoder = "ffmpeg" if use_ffmpeg else "cv2"
        self.color_input = color_input
        self.scale = scale
        self._max_frames = max_frames
        self._q: "queue.Queue" = queue.Queue(
            maxsize=max(prefetch_chunks, 1) * chunk_frames
        )
        self._done = object()
        self._err: Optional[BaseException] = None

        if use_ffmpeg:
            from ..utils.cv import handle_color_rgb_videors

            sd = ffdec.StreamDecoder(str(input_path), scale=scale)
            self.source_fps = sd.fps
            W, H = sd.width, sd.height
            convert = lambda f: handle_color_rgb_videors(f, color_input)

            def produce():
                n = 0
                while max_frames is None or n < max_frames:
                    f = sd.read()
                    if f is None:
                        break
                    self._q.put(convert(f))
                    n += 1
                sd.close()
        else:
            import cv2

            cap = cv2.VideoCapture(str(input_path))
            if not cap.isOpened():
                raise SourceError(f"could not open {input_path}")
            self.source_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
            W = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH) * scale)
            H = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT) * scale)

            def produce():
                n = 0
                while max_frames is None or n < max_frames:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    if scale != 1.0:
                        h, w = frame.shape[:2]
                        frame = cv2.resize(
                            frame, (int(w * scale), int(h * scale)),
                            interpolation=cv2.INTER_AREA,
                        )
                    self._q.put(handle_color(frame, color_input))
                    n += 1
                cap.release()

        C = 3 if color_input else 1
        plane = PlaneSize(W, H, C)
        self.video = Video(plane, Mode.FramePerfect, chunk_frames=chunk_frames)
        self.frame_idx = 0

        def run():
            try:
                produce()
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._done)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        self._exhausted = False

    # -- builder methods (shared contract with FramedArray) --

    def auto_time_parameters(self, ref_time, delta_t_max, time_mode=None):
        if delta_t_max % ref_time != 0:
            raise SourceError("delta_t_max must be a multiple of ref_time")
        tps = int(ref_time * self.source_fps)
        self.video.time_parameters(tps, ref_time, delta_t_max, time_mode)
        return self

    time_parameters = FramedArray.time_parameters
    crf = FramedArray.crf
    quality_manual = FramedArray.quality_manual
    write_out = FramedArray.write_out
    detect_features = FramedArray.detect_features
    get_ref_time = FramedArray.get_ref_time
    get_video_ref = FramedArray.get_video_ref
    get_video_mut = FramedArray.get_video_mut
    get_running_input_bitrate = FramedArray.get_running_input_bitrate

    def _next_chunk(self):
        from ..utils import tracing

        frames = []
        with tracing.stage("framed.decode_wait"):
            while len(frames) < self.video.chunk_frames:
                item = self._q.get()
                if item is self._done:
                    self._exhausted = True
                    if self._err is not None:
                        raise self._err
                    break
                frames.append(item)
        return frames

    def consume_batch(self, max_frames=None):
        from ..core.types import EventArray

        if self._exhausted and self._q.empty():
            pending_any = bool(self.video._inflight)
            self.video.flush()
            if not pending_any:
                raise EOFError("source exhausted")
            return EventArray.empty()
        frames = self._next_chunk()
        if not frames:
            pending_any = bool(self.video._inflight)
            self.video.flush()
            if not pending_any:
                raise EOFError("source exhausted")
            return EventArray.empty()
        self.frame_idx += len(frames)
        self.video.submit_chunk(
            np.stack(frames), float(self.video.ref_time)
        )
        if len(self.video._inflight) > 1:
            return self.video._collect_oldest()
        return EventArray.empty()

    def consume(self):
        return self.consume_batch()
