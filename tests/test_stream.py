"""Online-stream ingestion endpoint (io/stream): the ROS-node role
(Examples/ROS/ORB_SLAM2/src/ros_rgbd.cc subscribe -> TrackRGBD ->
publish) over a plain socket protocol, no ROS dependency."""

import dataclasses
import socket
import threading

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io import stream
from multimot_track_tpu.io.kitti import KittiSequence

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=4096, k_obj_max=4
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60, obj_lm_iters=100
    ),
)


@pytest.mark.slow
def test_stream_serving_matches_offline(kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    frames = [seq.load_frame(i) for i in range(4)]

    a, b = socket.socketpair()
    server_out = {}

    def server():
        server_out["sys"] = stream.serve_connection(b, cfg=CFG)
        b.close()

    th = threading.Thread(target=server)
    th.start()
    results = []
    for fd in frames:
        stream.send_frame(
            a, np.clip(fd.gray, 0, 255).astype(np.uint8),
            np.clip(fd.depth_raw, 0, 65535).astype(np.uint16),
            flow=fd.flow, sem=fd.sem_mask,
            frame=fd.index, timestamp=fd.timestamp,
        )
        results.append(stream.recv_result(a))
    a.shutdown(socket.SHUT_WR)
    th.join(timeout=600)
    assert not th.is_alive()
    a.close()

    assert [r["frame"] for r in results] == [0, 1, 2, 3]
    assert all(r["state"] == "OK" for r in results)
    # tracked frames have inliers and a moving pose
    assert results[1]["n_inliers"] > 100
    T3 = np.asarray(results[3]["Tcw"]).reshape(4, 4)
    assert 1.0 < np.linalg.norm(np.linalg.inv(T3)[:3, 3]) < 8.0
    # one mover found with a plausible speed (kitti car ~50-80 km/h)
    objs = results[2]["objects"]
    assert objs and 20.0 < objs[0]["speed"] < 120.0

    # the server-side system exposes the full facade afterwards
    s = server_out["sys"].summary()
    assert s["n_frames"] == 4


def test_stream_protocol_roundtrip():
    """Codec-level: frame -> bytes -> frame, plus the response framing."""
    a, b = socket.socketpair()
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    depth = np.arange(12, dtype=np.uint16).reshape(3, 4) * 100
    flow = np.random.default_rng(0).normal(size=(3, 4, 2)).astype(np.float16)
    stream.send_frame(a, gray, depth, flow=flow, frame=7, timestamp=1.25)
    header, arrays = stream._recv_frame(b)
    assert header["frame"] == 7 and header["timestamp"] == 1.25
    np.testing.assert_array_equal(arrays["gray"], gray)
    np.testing.assert_array_equal(arrays["depth"], depth)
    np.testing.assert_array_equal(arrays["flow"], flow)
    assert "sem" not in arrays
    a.close(); b.close()
