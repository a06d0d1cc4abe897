"""ADDER -> DVS polarity-event transcoder.

ref: adder-to-dvs/src/main.rs. Per-pixel log-intensity state fires +-events
when the reconstructed frame intensity crosses the theta threshold; output is
Prophesee-style text or binary (.dat layout) plus an optional event-count
visualization frame.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from typing import BinaryIO, Optional

import numpy as np

from ..codec.decoder import open_file_decoder
from ..core.types import D_ZERO_INTEGRATION, D_EMPTY, NO_CHANNEL, TimeMode, is_framed


@dataclass
class DvsEvent:
    t: int
    x: int
    y: int
    p: int


def event_to_frame_intensity(d: int, t: int, frame_length: int) -> float:
    """ref: adder-to-dvs/src/main.rs:450-460. d >= 128 (including the legacy
    254 zero-integration sentinel found in old fixtures) maps to 0."""
    if d >= D_ZERO_INTEGRATION:
        return 0.0
    base = float(2.0 ** d)
    if t == 0:
        return float(np.log1p(base * frame_length / 255.0))
    return float(np.log1p((base / t) * frame_length / 255.0))


def write_dvs_header(writer: BinaryIO, width: int, height: int, binary: bool) -> None:
    """Prophesee-style %-comment header (ref: main.rs:151-163)."""
    writer.write(f"% Height {height}\n".encode())
    writer.write(f"% Width {width}\n".encode())
    writer.write(b"% Version 2\n")
    now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    writer.write(f"% Date {now}\n".encode())
    writer.write(b"% end\n")
    if binary:
        writer.write(bytes([0, 8]))  # event type, size


def encode_dvs_binary(events: list) -> bytes:
    """Prophesee .dat record layout (ref: main.rs:533-556)."""
    out = np.zeros((len(events), 2), dtype="<u4")
    for i, e in enumerate(events):
        out[i, 0] = e.t & 0xFFFFFFFF
        out[i, 1] = (e.p << 28) | (e.y << 14) | e.x
    return out.tobytes()


def adder_to_dvs(
    input_path: str,
    output_events: BinaryIO,
    output_mode: str = "binary",
    theta: float = 0.01,
    reorder: bool = False,
    max_events: Optional[int] = None,
) -> dict:
    """Transcode an .adder file to DVS events. Returns stats
    {n_adder_events, n_dvs_events, event_count_frame}."""
    dec = open_file_decoder(input_path)
    meta = dec.meta
    W, H, C = meta.plane.width, meta.plane.height, meta.plane.channels
    binary = output_mode == "binary"
    write_dvs_header(output_events, W, H, binary)

    events = dec.digest_all()
    if max_events is not None:
        events = events[:max_events]

    # per-pixel state (ref: main.rs:59-63): d, ln intensity, t
    have = np.zeros((H, W, C), dtype=bool)
    px_ln = np.zeros((H, W, C), dtype=np.float64)
    px_t = np.zeros((H, W, C), dtype=np.uint64)
    event_counts = np.zeros((H, W, C), dtype=np.uint32)

    delta_t_mode = meta.time_mode == TimeMode.DeltaT
    framed = is_framed(meta.source_camera)
    ref = max(meta.ref_interval, 1)

    out: list = []
    ln_floor = float(np.log1p(0.0))
    ln_ceil = float(np.log1p(1.0))

    cs = np.where(events.c == NO_CHANNEL, 0, events.c)
    for i in range(len(events)):
        x, y, c = int(events.x[i]), int(events.y[i]), int(cs[i])
        d, t = int(events.d[i]), int(events.t[i])
        event_counts[y, x, c] += 1
        if not have[y, x, c]:
            # the reference panics for d > D_ZERO_INTEGRATION here
            # (main.rs:263-266); we accept legacy sentinels (253/254/255)
            # as zero-intensity starts for robustness with old fixtures
            have[y, x, c] = True
            px_ln[y, x, c] = event_to_frame_intensity(d, t, ref)
            px_t[y, x, c] = t
            continue

        old_t = int(px_t[y, x, c])
        if delta_t_mode:
            px_t[y, x, c] = old_t + t
        else:
            px_t[y, x, c] = t
            t = max(t - old_t, 0)
        if framed:
            pt = int(px_t[y, x, c])
            if pt % ref != 0:
                px_t[y, x, c] = (pt // ref + 1) * ref

        if d == D_EMPTY:
            continue
        new_ln = event_to_frame_intensity(d, t, ref)
        cur = px_ln[y, x, c]
        fire_p = None
        # mid-gray special cases + threshold crossings (ref: main.rs:292-360)
        if 0.406 < new_ln < 0.407 and (
            cur > ln_ceil - theta or (px_t[y, x, c] == old_t and cur > 0.6)
        ):
            fire_p = 1
        elif 0.406 < new_ln < 0.407 and (
            cur < ln_floor + theta or (px_t[y, x, c] == old_t and cur < 0.3)
        ):
            fire_p = 0
        elif new_ln > cur + theta / 2.0:
            fire_p = 1
        elif new_ln < cur - theta / 2.0:
            fire_p = 0
        if fire_p is not None:
            out.append(DvsEvent(old_t + 1, x, y, fire_p))
            px_ln[y, x, c] = new_ln

    if reorder:
        out.sort(key=lambda e: e.t)
    if binary:
        output_events.write(encode_dvs_binary(out))
    else:
        for e in out:
            output_events.write(f"{e.t} {e.x} {e.y} {e.p}\n".encode())

    mx = max(int(event_counts.max()), 1)
    count_frame = (event_counts.astype(np.float32) / mx * 255.0).astype(np.uint8)
    return {
        "n_adder_events": len(events),
        "n_dvs_events": len(out),
        "event_count_frame": count_frame,
    }
