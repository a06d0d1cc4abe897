"""Web GUI (tools/adder_viz.py): drive the HTTP API headlessly."""

import importlib.util
import json
import pathlib
import threading
import time
import urllib.request

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_viz():
    spec = importlib.util.spec_from_file_location(
        "adder_viz_web", REPO / "tools" / "adder_viz.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_viz_play_tab(samples_dir, tmp_path):
    from http.server import ThreadingHTTPServer

    viz = _load_viz()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), viz.Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        # index page serves
        page = urllib.request.urlopen(base + "/").read()
        assert b"ADDER viz" in page

        # start playing a committed fixture
        cfg = {
            "tab": "play",
            "path": str(samples_dir / "sample_3_ordered.adder"),
            "crf": 3, "view_mode": 0, "features": "off", "roi": "",
            "dtref": 255, "dtmult": 30, "outpath": "",
        }
        urllib.request.urlopen(
            urllib.request.Request(
                base + "/api/start", json.dumps(cfg).encode(), method="POST"
            )
        )
        frame = None
        stats = {}
        for _ in range(100):
            time.sleep(0.2)
            s = json.loads(
                urllib.request.urlopen(base + "/api/stats").read()
            )
            stats = s["stats"]
            try:
                frame = urllib.request.urlopen(base + "/api/frame").read()
            except urllib.error.HTTPError:
                pass
            if frame and stats.get("frames_emitted", 0) > 0:
                break
        assert stats.get("frames_emitted", 0) > 0, stats
        assert frame and frame[:8] == b"\x89PNG\r\n\x1a\n"

        # live view-mode switch while playing
        cfg["view_mode"] = 2
        urllib.request.urlopen(
            urllib.request.Request(
                base + "/api/adaptive", json.dumps(cfg).encode(),
                method="POST",
            )
        )
        urllib.request.urlopen(
            urllib.request.Request(base + "/api/stop", b"{}", method="POST")
        )
    finally:
        viz.SESSION.stop()
        srv.shutdown()
