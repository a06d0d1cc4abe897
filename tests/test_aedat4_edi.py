"""aedat4 container + EDI deblur reconstructor.

The reference ingests DAVIS data through the external davis-edi-rs crate;
these tests exercise the in-repo equivalents end-to-end: write an aedat4
fixture (blurry APS frames + ideal DVS events for a known moving scene),
read it back, deblur via EDI, and transcode to a valid `.adder` stream
through the Davis source.
"""

import io
import subprocess
import sys
import pathlib

import numpy as np
import pytest

from adder_tpu.core.types import PlaneSize
from adder_tpu.utils.aedat4 import (
    COMPRESSION_NONE,
    COMPRESSION_ZSTD,
    Aedat4Reader,
    Aedat4Writer,
    EventsPacket,
    FramePacket,
)
from adder_tpu.transcoder import edi

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.parametrize("compression", [COMPRESSION_NONE, COMPRESSION_ZSTD])
def test_aedat4_roundtrip(compression):
    buf = io.BytesIO()
    w = Aedat4Writer(buf, 64, 48, compression=compression)
    rng = np.random.default_rng(0)
    t = np.sort(rng.integers(0, 100000, 500)).astype(np.int64)
    x = rng.integers(0, 64, 500)
    y = rng.integers(0, 48, 500)
    on = rng.integers(0, 2, 500)
    w.write_events(t, x, y, on)
    img = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    w.write_frame(50000, 40000, 60000, img)
    w.write_events(t + 200000, x, y, 1 - on)

    buf.seek(0)
    r = Aedat4Reader(buf)
    assert r.streams[0].type_id == "EVTS"
    assert r.streams[0].size_x == 64 and r.streams[0].size_y == 48
    pkts = list(r.packets())
    assert len(pkts) == 3
    ev0, frame, ev1 = pkts
    assert isinstance(ev0, EventsPacket) and isinstance(frame, FramePacket)
    np.testing.assert_array_equal(ev0.events["t"], t)
    np.testing.assert_array_equal(ev0.events["x"], x)
    np.testing.assert_array_equal(ev0.events["y"], y)
    np.testing.assert_array_equal(ev0.events["on"] != 0, on != 0)
    assert frame.t == 50000
    assert frame.exposure_begin_t == 40000
    assert frame.exposure_end_t == 60000
    np.testing.assert_array_equal(frame.image, img)
    np.testing.assert_array_equal(ev1.events["on"] != 0, on == 0)


def test_lz4_block_roundtrip_against_reference_vectors():
    """The native LZ4 block decoder against hand-built compressed blocks."""
    from adder_tpu.codec.compressed import lz4_block_decompress

    # literals-only block: token lit_len<<4, literals
    blk = bytes([0x50]) + b"hello"
    assert lz4_block_decompress(blk, 64) == b"hello"
    # one match: 4 literals "abcd", then match offset 4 len 4 -> "abcdabcd"
    blk = bytes([0x40]) + b"abcd" + bytes([0x04, 0x00]) + bytes([0x00])
    # token: lit=4, match=0 (+4); trailing literals token with 0
    blk = bytes([(4 << 4) | 0]) + b"abcd" + bytes([0x04, 0x00]) + bytes([0x00])
    assert lz4_block_decompress(blk, 64) == b"abcdabcd"
    # overlapping match (RLE): 1 literal "x", offset 1, len 8 -> "x"*9
    blk = bytes([(1 << 4) | (8 - 4)]) + b"x" + bytes([0x01, 0x00]) + bytes([0x00])
    assert lz4_block_decompress(blk, 64) == b"x" * 9


def _moving_edge_scene(W=64, H=48, c=0.2):
    """Sharp scene: bright square moving right 1 px per 1000 us; returns
    (sharp frame at exposure start, blurry frame over exposure, events)."""
    T = 16000.0  # exposure us
    step = 1000.0
    base = np.full((H, W), 32.0)

    def sharp_at(shift):
        f = base.copy()
        f[12:36, 8 + shift : 24 + shift] = 200.0
        return f

    n_steps = int(T / step)
    acc = np.zeros((H, W))
    events = []  # ideal events: log-intensity crossings at each shift
    prev = sharp_at(0)
    for s in range(n_steps):
        cur = sharp_at(s)
        acc += cur * step
        if s > 0:
            dln = np.log(np.maximum(cur, 1.0)) - np.log(np.maximum(prev, 1.0))
            n_ev = np.round(np.abs(dln) / c).astype(int)
            ys, xs = np.nonzero(n_ev)
            for yy, xx in zip(ys, xs):
                k = n_ev[yy, xx]
                pol = 1 if dln[yy, xx] > 0 else -1
                for j in range(k):
                    events.append((s * step + j * 1e-3, xx, yy, pol))
            prev = cur
    blurry = acc / T
    ev = np.array(
        events, dtype=[("t", "f8"), ("x", "i4"), ("y", "i4"), ("p", "i4")]
    )
    return sharp_at(0), blurry, ev, T


def test_edi_deblur_recovers_sharp_frame():
    c = 0.2
    sharp, blurry, ev, T = _moving_edge_scene(c=c)
    out = edi.deblur(
        blurry, ev["x"], ev["y"], ev["p"], ev["t"], T, c
    )
    # the deblurred frame must be much closer to the sharp frame than the
    # blurry input is
    err_blur = np.abs(blurry - sharp).mean()
    err_edi = np.abs(out.astype(np.float64) - sharp).mean()
    assert err_edi < err_blur * 0.35, (err_edi, err_blur)


def test_edi_optimize_c_finds_neighborhood():
    c_true = 0.2
    _, blurry, ev, T = _moving_edge_scene(c=c_true)
    c_est = edi.optimize_c(blurry, ev["x"], ev["y"], ev["p"], ev["t"], T)
    assert 0.1 < c_est < 0.4, c_est


def _write_davis_fixture(path, W=64, H=48, c=0.2, n_frames=3, color=False):
    w = Aedat4Writer(path, W, H, compression=COMPRESSION_ZSTD)
    t0 = 1_000_000
    for i in range(n_frames):
        sharp, blurry, ev, T = _moving_edge_scene(W, H, c)
        start = t0 + i * 40000
        w.write_events(
            (start + ev["t"]).astype(np.int64), ev["x"], ev["y"],
            (ev["p"] > 0).astype(np.int8),
        )
        img = np.clip(blurry, 0, 255).astype(np.uint8)
        if color:
            img = np.repeat(img[..., None], 3, axis=2)  # gray BGR triplets
        w.write_frame(start + int(T) // 2, start, start + int(T), img)
    w.close()


def test_threaded_provider_overlaps_consumer():
    """P4: the worker-thread provider overlaps production with consumption —
    wall-clock for equal-cost producer/consumer stages approaches max(), not
    sum() (ref: davis.rs:626-632 runs davis-edi-rs on its own thread)."""
    import time

    from adder_tpu.core.types import PlaneSize
    from adder_tpu.transcoder.davis import DavisPacket
    from adder_tpu.transcoder.edi import ThreadedProvider

    N, STEP = 8, 0.05

    class SlowProvider:
        plane = PlaneSize(8, 8, 1)

        def __iter__(self):
            for i in range(N):
                time.sleep(STEP)  # stands in for host deblur cost
                yield DavisPacket(
                    frame=np.zeros((8, 8), np.uint8),
                    frame_start_us=i * 1000, frame_end_us=i * 1000 + 500,
                    events=[],
                )

    t0 = time.perf_counter()
    got = 0
    for _ in ThreadedProvider(SlowProvider()):
        time.sleep(STEP)  # stands in for device integration cost
        got += 1
    wall = time.perf_counter() - t0
    assert got == N
    serial = 2 * N * STEP
    # generous margin for loaded CI hosts; an inline provider cannot go
    # below `serial` at all
    assert wall < serial * 0.8, (wall, serial)


def test_edi_color_aps_frames(tmp_path):
    """3-channel aedat4 APS frames must flow through the EDI reconstructor
    as 2-D luma planes (regression: handle_color's (H, W, 1) output crashed
    deblur's `H, W = shape` unpack)."""
    fx = tmp_path / "davis_color.aedat4"
    _write_davis_fixture(str(fx), n_frames=2, color=True)
    pkts = list(edi.EdiReconstructor(str(fx)))
    assert len(pkts) == 2
    for pkt in pkts:
        assert pkt.frame.ndim == 2
        assert pkt.frame.shape == (48, 64)


@pytest.mark.parametrize(
    "batched",
    # the batched variant repeats pins held elsewhere in the fast tier
    # (batched-Davis parity: test_dvs_batch.test_davis_batched_matches_
    # oracle[RawDavis]; the aedat4->EDI->Davis e2e path: the oracle
    # variant here) at ~200 s of scan-engine compiles — slow tier
    [False, pytest.param(True, marks=pytest.mark.slow)],
    ids=["oracle", "batched"],
)
def test_davis_aedat4_to_adder_e2e(tmp_path, batched):
    """aedat4 -> EDI -> Davis source -> .adder file decodes back (both the
    scalar-oracle and the batched device integration paths consume the
    SoA DvsEvents batches the reconstructor emits)."""
    from adder_tpu.codec.decoder import open_file_decoder
    from adder_tpu.codec.encoder import EncoderOptions, EncoderType
    from adder_tpu.core.types import PixelMultiMode, SourceCamera, TimeMode
    from adder_tpu.transcoder.davis import Davis, TranscoderMode

    fx = tmp_path / "davis.aedat4"
    _write_davis_fixture(str(fx))

    recon = edi.EdiReconstructor(str(fx))
    src = Davis(
        recon, ref_time=255, tps=255_000_000,
        delta_t_max=255_000_000, mode=TranscoderMode.RawDavis,
        batched=batched,
    )
    out_path = tmp_path / "davis.adder"
    out = open(out_path, "wb")
    src.write_out(
        SourceCamera.DavisU8, TimeMode.AbsoluteT, PixelMultiMode.Collapse,
        None, EncoderType.Raw, EncoderOptions.default(src.plane), out,
    )
    n = 0
    try:
        while True:
            n += len(src.consume())
    except EOFError:
        pass
    src.end_write_stream()
    out.close()
    assert n > 0

    dec = open_file_decoder(str(out_path))
    evs = dec.digest_all()
    assert len(evs) == n
    assert evs.x.max() < 64 and evs.y.max() < 48


def test_davis_to_adder_cli(tmp_path):
    fx = tmp_path / "davis.aedat4"
    _write_davis_fixture(str(fx), n_frames=2)
    out = tmp_path / "out.adder"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "davis_to_adder.py"),
         "-i", str(fx), "--output-events-filename", str(out),
         "--transcode-from", "framed"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.stat().st_size > 0


def test_aedat4_dvs_visualize_cli(tmp_path):
    fx = tmp_path / "davis.aedat4"
    _write_davis_fixture(str(fx), n_frames=2)
    out = tmp_path / "dvs.gray8"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "aedat4_dvs_visualize.py"),
         "-i", str(fx), "--output-video", str(out), "--fps", "100"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.stat().st_size > 0


def test_aedat4_socket_stream(tmp_path):
    """Live-stream ingest over TCP (the reference's EDI socket mode):
    serving a fixture over localhost yields the same packets, with or
    without the file magic prefix."""
    import socket
    import threading

    fx = tmp_path / "davis.aedat4"
    _write_davis_fixture(str(fx), n_frames=2)
    data = fx.read_bytes()

    for strip_magic in (False, True):
        payload = data[14:] if strip_magic else data
        srv = socket.create_server(("127.0.0.1", 0))
        port = srv.getsockname()[1]

        def serve():
            conn, _ = srv.accept()
            conn.sendall(payload)
            conn.close()

        th = threading.Thread(target=serve, daemon=True)
        th.start()
        r = Aedat4Reader(f"tcp://127.0.0.1:{port}")
        pkts = list(r.packets())
        ref = list(Aedat4Reader(str(fx)).packets())
        assert len(pkts) == len(ref) > 0
        th.join()
        srv.close()
