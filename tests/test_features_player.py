"""Tests for the feature pipeline, player, live transcoder, davis source."""

import io

import numpy as np
import pytest

from adder_tpu.codec.encoder import EncoderOptions, EncoderType
from adder_tpu.core.types import (
    Mode,
    PixelMultiMode,
    PlaneSize,
    SourceCamera,
    TimeMode,
)
from adder_tpu.models.player import AdderPlayer
from adder_tpu.transcoder.davis import (
    ArrayDavisProvider,
    Davis,
    DavisPacket,
    DvsEvent,
    TranscoderMode,
)
from adder_tpu.transcoder.d_controller import (
    DControllerAggressive,
    DControllerManual,
    DControllerStandard,
)
from adder_tpu.transcoder.framed import FramedArray
from adder_tpu.utils.viz import ShowFeatureMode, draw_feature_coord, draw_rect


def moving_square_frames(T=10, H=24, W=32):
    frames = np.full((T, H, W, 1), 30, dtype=np.uint8)
    for t in range(T):
        x0 = 4 + t
        frames[t, 6:16, x0 : x0 + 10, 0] = 220
    return frames


def test_video_feature_detection():
    frames = moving_square_frames()
    src = FramedArray(frames, source_fps=24.0, chunk_frames=5)
    src.auto_time_parameters(255, 255 * 30, TimeMode.AbsoluteT)
    src.detect_features(True)
    src.video.update_detect_features(True, ShowFeatureMode.Instant, False, True)
    while True:
        try:
            src.consume_batch()
        except EOFError:
            break
    # the moving square's corners must register as features
    assert len(src.video.features) > 0
    # display frame has markers drawn
    assert src.video.display_frame_features.shape == (24, 32, 1)


def test_video_feature_rate_adjustment():
    frames = moving_square_frames()
    src = FramedArray(frames, source_fps=24.0, chunk_frames=5)
    src.auto_time_parameters(255, 255 * 30, TimeMode.AbsoluteT)
    src.crf(5)  # nonzero feature_c_radius
    src.video.update_detect_features(True, ShowFeatureMode.Off, True, False)
    while True:
        try:
            src.consume_batch()
        except EOFError:
            break
    c = np.asarray(src.video.state.c_thresh)
    # some pixels near features were lowered to min(baseline, 2)
    assert c.min() <= 2


def test_dbscan_cluster():
    frames = moving_square_frames()
    src = FramedArray(frames, source_fps=24.0, chunk_frames=5)
    src.auto_time_parameters(255, 255 * 4, TimeMode.AbsoluteT)
    pts = {(5, 5), (6, 5), (5, 6), (6, 6), (20, 20)}
    boxes = src.video.cluster(pts)
    assert len(boxes) >= 1
    x0, y0, x1, y1 = boxes[0]
    assert x1 >= x0 and y1 >= y0


def test_viz_draw():
    img = np.zeros((10, 10, 1), dtype=np.uint8)
    draw_feature_coord(5, 5, img, False)
    assert img[5, 5, 0] == 255 and img[3, 5, 0] == 255
    draw_rect(1, 1, 8, 8, img, False)
    assert img[1, 4, 0] == 255 and img[8, 8, 0] == 255


def test_player_roundtrip(samples_dir):
    player = AdderPlayer(str(samples_dir / "sample_3_ordered.adder"))
    frames = list(player.frames(batch_events=2048))
    assert len(frames) >= 405
    assert frames[0].shape == (5, 10, 1)
    assert player.stats.events_total > 10000
    # looping: restart works
    player.seek_to_beginning()
    again = list(player.frames(batch_events=2048))
    assert len(again) == len(frames)
    assert np.array_equal(again[0], frames[0])


def test_player_view_mode(samples_dir):
    from adder_tpu.framer.scale_intensity import FramedViewMode

    player = AdderPlayer(
        str(samples_dir / "sample_3_ordered.adder"), view_mode=FramedViewMode.D
    )
    frames = list(player.frames(batch_events=1 << 16))
    assert len(frames) > 0


def test_davis_modes():
    H, W = 16, 16
    plane = PlaneSize(W, H, 1)
    frame0 = np.full((H, W), 100, dtype=np.uint8)
    frame1 = np.full((H, W), 120, dtype=np.uint8)
    events = [
        DvsEvent(t=1500, x=3, y=4, on=True),
        DvsEvent(t=2500, x=3, y=4, on=True),
        DvsEvent(t=3000, x=8, y=8, on=False),
    ]
    packets = [
        DavisPacket(frame0, 1000, 2000, []),
        DavisPacket(frame1, 3000, 4000, events),
    ]
    for mode in TranscoderMode:
        src = Davis(ArrayDavisProvider(packets, plane), ref_time=255, mode=mode)
        n = 0
        while True:
            try:
                n += len(src.consume())
            except EOFError:
                break
        if mode != TranscoderMode.RawDvs:
            assert n > 0, mode


def test_d_controllers():
    std = DControllerStandard(d=7)
    for _ in range(6):
        d = std.throttle(100.0)
    assert d > 7  # stable -> D grew
    d2 = std.throttle(500.0)
    assert d2 == d - 1  # misprediction -> shrink

    agg = DControllerAggressive(d=7, in_roi=True)
    agg.throttle(100.0)
    man = DControllerManual(d=5)
    assert man.throttle(123.0) == 5


def test_feature_pipelining_matches_sequential():
    """Features-on submit/collect pipelining (device-chained running-frame
    carry + batched device FAST lookup) must produce the same event bytes
    AND the same feature set as strictly sequential chunks (round 3
    flushed before every chunk, serializing the pipeline)."""
    from adder_tpu.transcoder.video import Video

    frames = moving_square_frames(T=12)
    plane = PlaneSize(32, 24, 1)

    def run(pipelined):
        out = io.BytesIO()
        v = Video(plane, Mode.FramePerfect)
        v.time_parameters(255 * 30, 255, 255 * 30, TimeMode.AbsoluteT)
        v.write_out(
            SourceCamera.FramedU8, TimeMode.AbsoluteT,
            PixelMultiMode.Collapse, None, EncoderType.Raw,
            EncoderOptions.default(plane), out,
        )
        v.update_detect_features(True, ShowFeatureMode.Instant, False, False)
        chunks = [frames[i * 3 : (i + 1) * 3] for i in range(4)]
        if pipelined:
            for c in chunks:
                v.submit_chunk(c)
            v.flush()
        else:
            for c in chunks:
                v.collect_chunk(v.submit_chunk(c))
        v.end_write_stream()
        return set(v.features), out.getvalue()

    f_seq, b_seq = run(False)
    f_pipe, b_pipe = run(True)
    assert b_pipe == b_seq
    assert f_pipe == f_seq
    assert len(f_seq) > 0
