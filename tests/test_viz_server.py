"""MJPEG display server (the reference's render-node + websocket layers,
SURVEY.md C10/L5) and the host-side NV12 left-eye decode feeding it."""

import http.client
import io

import numpy as np
import pytest
from PIL import Image

from hobot_stereonet_tpu.data.stream import (
    rgb_pair_to_sbs_nv12,
    sbs_nv12_to_left_rgb,
)
from hobot_stereonet_tpu.viz.server import DisplayServer, encode_jpeg, publish_result


def _decode(jpeg: bytes) -> np.ndarray:
    return np.asarray(Image.open(io.BytesIO(jpeg)))


def test_sbs_nv12_left_rgb_roundtrip(rng):
    left = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
    right = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
    buf = rgb_pair_to_sbs_nv12(left, right)
    dec = sbs_nv12_to_left_rgb(buf, 32, 128)
    assert dec.shape == (32, 64, 3) and dec.dtype == np.uint8
    # 4:2:0 chroma + rounding: luma-dominated content survives closely.
    # Compare in luma space (chroma subsampling loses high-freq color).
    luma = lambda x: 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    assert np.abs(luma(dec).astype(np.float32) - luma(left)).mean() < 2.0


def test_sbs_left_rgb_flat_color():
    # A flat-color frame must round-trip almost exactly (no subsampling loss).
    left = np.full((16, 32, 3), (200, 60, 120), dtype=np.uint8)
    right = np.zeros((16, 32, 3), dtype=np.uint8)
    buf = rgb_pair_to_sbs_nv12(left, right)
    dec = sbs_nv12_to_left_rgb(buf, 16, 64)
    assert np.abs(dec.astype(int) - left.astype(int)).max() <= 3


@pytest.fixture
def server():
    srv = DisplayServer(port=0, host="127.0.0.1", metrics_fn=lambda: {"fps": 12.5})
    srv.start()
    yield srv
    srv.stop()


def test_frame_and_metrics_endpoints(server, rng):
    # Smooth gradient: JPEG-friendly content so the decode check is tight.
    u, v = np.meshgrid(np.linspace(0, 255, 32), np.linspace(0, 255, 24))
    rgb = np.stack([u, v, (u + v) / 2], axis=-1).astype(np.uint8)
    server.publish(rgb)

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=5)
    conn.request("GET", "/frame.jpg")
    resp = conn.getresponse()
    assert resp.status == 200 and resp.getheader("Content-Type") == "image/jpeg"
    dec = _decode(resp.read())
    assert dec.shape == (24, 32, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 20  # jpeg-lossy

    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    assert resp.status == 200
    assert b'"fps": 12.5' in resp.read()

    conn.request("GET", "/")
    resp = conn.getresponse()
    body = resp.read()
    assert resp.status == 200 and b"/stream" in body

    conn.request("GET", "/nope")
    resp = conn.getresponse()
    resp.read()
    assert resp.status == 404
    conn.close()


def test_frame_before_first_publish():
    srv = DisplayServer(port=0, host="127.0.0.1")
    srv.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=5)
        conn.request("GET", "/frame.jpg")
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 503
        conn.close()
    finally:
        srv.stop()


def test_mjpeg_stream_delivers_frames(server, rng):
    frames = [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8) for _ in range(2)]
    server.publish(frames[0])

    import socket
    import threading
    import time

    sock = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    sock.sendall(b"GET /stream HTTP/1.1\r\nHost: x\r\n\r\n")

    # Publish the second frame shortly after the client connects.
    t = threading.Timer(0.2, lambda: server.publish(frames[1]))
    t.start()

    buf = b""
    deadline = time.monotonic() + 5
    while buf.count(b"--frame") < 2 and time.monotonic() < deadline:
        sock.settimeout(max(0.1, deadline - time.monotonic()))
        try:
            chunk = sock.recv(65536)
        except TimeoutError:
            break
        if not chunk:
            break
        buf += chunk
    t.join()
    sock.close()
    assert b"multipart/x-mixed-replace" in buf
    assert buf.count(b"Content-Type: image/jpeg") >= 1
    # Extract the first JPEG payload and decode it.
    start = buf.find(b"\xff\xd8")
    end = buf.find(b"\xff\xd9", start)
    assert start != -1 and end != -1
    dec = _decode(buf[start : end + 2])
    assert dec.shape == (16, 16, 3)


def test_publish_result_composites(server, rng):
    from hobot_stereonet_tpu.runtime.engine import StereoResult

    disp = rng.uniform(0, 20, (16, 24)).astype(np.float32)
    left = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    publish_result(server, StereoResult(0, 0.0, disp, left_rgb=left))
    dec = _decode(server.latest_jpeg())
    assert dec.shape == (32, 24, 3)  # left stacked over colormap

    publish_result(server, StereoResult(1, 0.0, disp))  # no left view kept
    dec = _decode(server.latest_jpeg())
    assert dec.shape == (16, 24, 3)


def test_encode_jpeg_roundtrip(rng):
    rgb = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    dec = _decode(encode_jpeg(rgb, quality=95))
    assert dec.shape == rgb.shape
