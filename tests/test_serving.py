import json
import os
import subprocess
import sys

import numpy as np

from delora_tpu.config import load_config
from delora_tpu.serving.stream import OdometryIntegrator, StreamingOdometry, filter_scan


def serving_config():
    return load_config(overrides={
        "datasets": ["kitti"],
        "kitti": {"max_points": 1024, "vertical_cells": 16,
                  "horizontal_cells": 64},
        "resnet_outputs": 32,
        "layers": [1, 1, 1, 1],
        "factor_fewer_resnet_channels": 16,
        "compute_dtype": "float32",
    }, mode="testing")


def test_filter_scan_drops_bad_points():
    pts = np.array([
        [5.0, 0.0, -1.0],
        [0.0, 0.0, 0.0],          # zero -> dropped (range < 0.3)
        [0.1, 0.1, 0.0],          # too close -> dropped
        [np.nan, 1.0, 1.0],       # NaN -> dropped
        [10.0, 2.0, -1.5],
    ], dtype=np.float32)
    out = filter_scan(pts)
    assert out.shape == (2, 3)


def test_integrator_accumulates():
    integ = OdometryIntegrator()
    T = np.eye(4)
    T[0, 3] = 1.0
    for _ in range(5):
        pose = integ.integrate(T)
    np.testing.assert_allclose(pose[:3, 3], [5.0, 0, 0], atol=1e-9)


def test_streaming_engine_pairs_scans():
    config = serving_config()
    engine = StreamingOdometry(config, dataset="kitti")
    rng = np.random.default_rng(0)
    scan = lambda: rng.normal(size=(500, 3)).astype(np.float32) * np.array(
        [8, 8, 0.5], np.float32) - np.array([0, 0, 1.5], np.float32)

    assert engine.push_scan(scan()) is None          # first scan: no pair yet
    out = engine.push_scan(scan())
    assert out is not None
    T, pose, latency = out
    assert T.shape == (4, 4) and pose.shape == (4, 4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-6)
    # Second pair: integrator pose = T1 @ T2.
    T2, pose2, _ = engine.push_scan(scan())
    np.testing.assert_allclose(pose2, pose @ T2, atol=1e-4)


def test_stdin_protocol(tmp_path):
    """Drive the actual `delora serve` surface end-to-end via a subprocess."""
    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        scan = rng.normal(size=(400, 4)).astype(np.float32) * 5
        p = str(tmp_path / f"scan{i}.npy")
        np.save(p, scan)
        paths.append(p)

    driver = tmp_path / "drive_serve.py"
    driver.write_text(f"""
import sys, json
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax; jax.config.update("jax_platforms", "cpu")
sys.argv = ["x"]
from tests.test_serving import serving_config
from delora_tpu.serving.stream import StreamingOdometry
StreamingOdometry(serving_config(), dataset="kitti").serve_stdin()
""")
    inp = "\n".join(json.dumps({"scan": p}) for p in paths) + "\n" + \
        json.dumps({"scan": "/nonexistent.npy"}) + "\n"
    proc = subprocess.run(
        [sys.executable, str(driver)], input=inp, capture_output=True,
        text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    assert lines[0]["ready"] is True
    assert lines[1] == {"first_scan": True}
    assert "pose" in lines[2] and "latency_ms" in lines[2]
    assert "pose" in lines[3]
    assert "error" in lines[4]          # bad path -> error line, loop survives


def test_ros_bridge_gates_cleanly_without_ros():
    """The ROS bridge imports everywhere, raises a clear error on use
    without rospy, and its quaternion helper matches se3."""
    import numpy as np
    import pytest

    from delora_tpu.serving import ros_bridge
    from delora_tpu import se3
    import jax.numpy as jnp

    if not ros_bridge.ROS_AVAILABLE:
        with pytest.raises(ImportError, match="delora serve"):
            ros_bridge.RosOdometryBridge({}, checkpoint=None)

    R = np.asarray(se3.quat_to_rotmat(
        se3.normalize_quat(jnp.asarray([0.1, -0.2, 0.3, 0.9]))
    ))
    q = ros_bridge.rotmat_to_quat_np(R)
    R2 = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(R, R2, atol=1e-6)
