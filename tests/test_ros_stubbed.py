"""Execute the ROS bridge and bag writer under a stubbed ROS1 environment.

The real ROS stack cannot be installed here (TPU hosts ship without ROS —
see serving/ros_bridge.py), so these tests provide a minimal in-memory
`rospy`/`tf2_ros`/`sensor_msgs`/`rosbag` and drive the actual code paths the
reference exercises on a ROS host: PointCloud2 -> model -> Odometry + TF
(reference src/ros_utils/odometry_publisher.py:128-175) and KITTI -> bag
(reference src/ros_utils/convert_to_rosbag.py:33-66). Message *transport* is
faked; every line of our message construction, frame bookkeeping, and bag
sequencing logic runs for real.
"""

import importlib
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Minimal ROS1 stand-ins
# ---------------------------------------------------------------------------

class _Time:
    def __init__(self, sec=0.0):
        self.sec = float(sec)

    @classmethod
    def from_sec(cls, s):
        return cls(s)

    def to_sec(self):
        return self.sec

    def __add__(self, other):
        return _Time(self.sec + other.sec)

    def __eq__(self, other):
        return isinstance(other, _Time) and self.sec == other.sec


class _Publisher:
    def __init__(self, topic, msg_type, queue_size=None):
        self.topic = topic
        self.msg_type = msg_type
        self.published = []

    def publish(self, msg):
        self.published.append(msg)


class _TransformBroadcaster:
    def __init__(self):
        self.sent = []

    def sendTransform(self, tfm):
        self.sent.append(tfm)


class _Subscriber:
    def __init__(self, topic, msg_type, callback, queue_size=None,
                 buff_size=None):
        self.topic = topic
        self.callback = callback


def _xyz_quat_pose():
    return SimpleNamespace(
        position=SimpleNamespace(x=0.0, y=0.0, z=0.0),
        orientation=SimpleNamespace(x=0.0, y=0.0, z=0.0, w=1.0),
    )


class _Odometry:
    def __init__(self):
        self.header = SimpleNamespace(stamp=_Time(), frame_id="")
        self.pose = SimpleNamespace(pose=_xyz_quat_pose())


class _TransformStamped:
    def __init__(self):
        self.header = SimpleNamespace(stamp=_Time(), frame_id="")
        self.child_frame_id = ""
        self.transform = SimpleNamespace(
            translation=SimpleNamespace(x=0.0, y=0.0, z=0.0),
            rotation=SimpleNamespace(x=0.0, y=0.0, z=0.0, w=1.0),
        )


class _PointField:
    FLOAT32 = 7

    def __init__(self, name="", offset=0, datatype=0, count=1):
        self.name, self.offset = name, offset
        self.datatype, self.count = datatype, count


class _FakeCloud:
    """PointCloud2 stand-in: carries the raw [N, k] array + header."""

    def __init__(self, header=None, fields=None, points=None):
        self.header = header or SimpleNamespace(stamp=_Time(), frame_id="")
        self.fields = fields or []
        self.points = points


def _read_points(msg, field_names=("x", "y", "z"), skip_nans=False):
    pts = np.asarray(msg.points, dtype=np.float32)[:, : len(field_names)]
    if skip_nans:
        pts = pts[np.isfinite(pts).all(axis=1)]
    return [tuple(row) for row in pts]


def _create_cloud(header, fields, points):
    # Copy the header: the writer mutates one Header in place per message
    # (reference convert_to_rosbag.py does the same).
    h = SimpleNamespace(stamp=header.stamp, frame_id=header.frame_id)
    return _FakeCloud(header=h, fields=list(fields),
                      points=np.asarray(points, dtype=np.float32))


class _Bag:
    """rosbag.Bag stand-in: (topic, msg, t) tuples, stored per path."""

    store = {}

    def __init__(self, path, mode="r"):
        self.path = path
        self.mode = mode
        self.records = [] if mode == "w" else _Bag.store[path]

    def write(self, topic, msg, t):
        assert self.mode == "w"
        self.records.append((topic, msg, t))

    def get_message_count(self, topic_filters=None):
        if topic_filters and topic_filters != [None]:
            return sum(1 for r in self.records if r[0] in topic_filters)
        return len(self.records)

    def read_messages(self, topics=None):
        for topic, msg, t in self.records:
            if topics and topics != [None] and topic not in topics:
                continue
            yield topic, msg, t

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self.mode == "w":
            _Bag.store[self.path] = self.records
        return False


def _install_ros_stubs(monkeypatch):
    rospy = types.ModuleType("rospy")
    rospy.init_node = lambda *a, **k: None
    rospy.Publisher = _Publisher
    rospy.Subscriber = _Subscriber
    rospy.Time = _Time
    rospy.Duration = _Time
    rospy.loginfo_throttle = lambda *a, **k: None
    rospy.spin = lambda: None

    geom = types.ModuleType("geometry_msgs")
    geom_msg = types.ModuleType("geometry_msgs.msg")
    geom_msg.TransformStamped = _TransformStamped
    geom.msg = geom_msg

    nav = types.ModuleType("nav_msgs")
    nav_msg = types.ModuleType("nav_msgs.msg")
    nav_msg.Odometry = _Odometry
    nav.msg = nav_msg

    sens = types.ModuleType("sensor_msgs")
    sens_msg = types.ModuleType("sensor_msgs.msg")
    sens_msg.PointCloud2 = _FakeCloud
    sens_msg.PointField = _PointField
    pc2 = types.ModuleType("sensor_msgs.point_cloud2")
    pc2.read_points = _read_points
    pc2.create_cloud = _create_cloud
    sens.msg = sens_msg
    sens.point_cloud2 = pc2

    std = types.ModuleType("std_msgs")
    std_msg = types.ModuleType("std_msgs.msg")

    class _Header:
        def __init__(self):
            self.stamp = _Time()
            self.frame_id = ""

    std_msg.Header = _Header
    std.msg = std_msg

    tf2 = types.ModuleType("tf2_ros")
    tf2.TransformBroadcaster = _TransformBroadcaster

    rosbag_mod = types.ModuleType("rosbag")
    rosbag_mod.Bag = _Bag

    for name, mod in [
        ("rospy", rospy), ("geometry_msgs", geom),
        ("geometry_msgs.msg", geom_msg), ("nav_msgs", nav),
        ("nav_msgs.msg", nav_msg), ("sensor_msgs", sens),
        ("sensor_msgs.msg", sens_msg),
        ("sensor_msgs.point_cloud2", pc2), ("std_msgs", std),
        ("std_msgs.msg", std_msg), ("tf2_ros", tf2),
        ("rosbag", rosbag_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)


@pytest.fixture
def ros_bridge_stubbed(monkeypatch):
    """serving.ros_bridge reloaded against the stubs (and restored after)."""
    _install_ros_stubs(monkeypatch)
    from delora_tpu.serving import ros_bridge

    importlib.reload(ros_bridge)
    assert ros_bridge.ROS_AVAILABLE
    yield ros_bridge
    # Restore the module to the host's real (ROS-less) state for any test
    # that imports it afterwards (test_serving's gating test).
    monkeypatch.undo()
    importlib.reload(ros_bridge)


def test_ros_bridge_publishes_odometry_and_tf(ros_bridge_stubbed):
    """Two PointCloud2 scans through the real bridge callback produce one
    Odometry (relative pose, lidar frame) and one world->lidar TF whose
    transform is the integrated pose — the reference node's contract
    (odometry_publisher.py:137-166, odometry_integrator.py:41-54)."""
    from tests.test_serving import serving_config

    bridge = ros_bridge_stubbed.RosOdometryBridge(serving_config())
    rng = np.random.default_rng(3)

    def cloud():
        pts = rng.normal(size=(400, 3)).astype(np.float32) * np.array(
            [8, 8, 0.5], np.float32) - np.array([0, 0, 1.5], np.float32)
        # A NaN row and a too-close row: read_points drops the NaN,
        # the engine's filter_scan drops the near point.
        pts = np.concatenate([pts, [[np.nan, 1, 1], [0.01, 0.01, 0.0]]])
        msg = _FakeCloud(points=pts)
        msg.header.stamp = _Time(len(bridge.pub.published) * 0.1)
        return msg

    bridge._callback(cloud())                    # first scan: no pair yet
    assert bridge.pub.published == []
    assert bridge.tf_broadcaster.sent == []

    msg2 = cloud()
    bridge._callback(msg2)
    assert len(bridge.pub.published) == 1
    assert len(bridge.tf_broadcaster.sent) == 1

    odom = bridge.pub.published[0]
    tfm = bridge.tf_broadcaster.sent[0]
    assert odom.header.frame_id == "lidar"
    assert odom.header.stamp == msg2.header.stamp
    assert tfm.header.frame_id == "world"
    assert tfm.child_frame_id == "lidar"

    q = np.array([odom.pose.pose.orientation.x, odom.pose.pose.orientation.y,
                  odom.pose.pose.orientation.z, odom.pose.pose.orientation.w])
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)

    # First pair: integrator starts at identity, so TF pose == relative T.
    np.testing.assert_allclose(
        [tfm.transform.translation.x, tfm.transform.translation.y,
         tfm.transform.translation.z],
        [odom.pose.pose.position.x, odom.pose.pose.position.y,
         odom.pose.pose.position.z], atol=1e-6)
    np.testing.assert_allclose(
        [tfm.transform.rotation.x, tfm.transform.rotation.y,
         tfm.transform.rotation.z, tfm.transform.rotation.w], q, atol=1e-6)

    # Second pair: TF pose integrates (pose = T1 @ T2), so it must now
    # differ from the per-pair odometry translation in general.
    bridge._callback(cloud())
    assert len(bridge.tf_broadcaster.sent) == 2


def test_write_bag_sequences_scans(monkeypatch, tmp_path):
    """write_bag emits one PointCloud2 per scan at 10 Hz on the reference
    topic, with the 4 FLOAT32 fields (convert_to_rosbag.py:33-66)."""
    _install_ros_stubs(monkeypatch)
    sys.path.insert(0, "scripts")
    try:
        eks = importlib.import_module("export_kitti_sequence")
        eks = importlib.reload(eks)   # bind against the stubs
        scans = [np.full((n, 4), i, np.float32)
                 for i, n in enumerate((5, 7, 3))]
        out = str(tmp_path / "07.bag")
        n = eks.write_bag(scans, out)
    finally:
        sys.path.remove("scripts")

    assert n == 3
    records = _Bag.store[out]
    assert len(records) == 3
    topics = {r[0] for r in records}
    assert topics == {"/velodyne_points"}
    stamps = [r[2].to_sec() for r in records]
    np.testing.assert_allclose(stamps, [0.0, 0.1, 0.2], atol=1e-9)
    for i, (_, msg, _) in enumerate(records):
        assert msg.points.shape == scans[i].shape
        np.testing.assert_array_equal(msg.points, scans[i])
        assert [f.name for f in msg.fields] == ["x", "y", "z", "intensity"]
        assert all(f.datatype == _PointField.FLOAT32 for f in msg.fields)
        assert msg.header.frame_id == "velodyne"
        # Header is stamped per message, not shared (mutation bug guard).
        assert msg.header.stamp.to_sec() == pytest.approx(i * 0.1)


def test_bag_roundtrip_through_reader(monkeypatch, tmp_path):
    """KITTI->bag->training-reader round trip: write_bag's output read back
    by RosbagSequenceReader's real-bag branch (reference
    src/data/rosbag_scans.py:15-40 semantics: topic selection, message
    count, NaN/zero/min-range filtering)."""
    _install_ros_stubs(monkeypatch)
    sys.path.insert(0, "scripts")
    try:
        eks = importlib.reload(importlib.import_module("export_kitti_sequence"))
    finally:
        sys.path.remove("scripts")

    rng = np.random.default_rng(7)
    scans = [rng.normal(size=(50, 4)).astype(np.float32) * 5 for _ in range(3)]
    scans[1][0] = [np.nan, 1, 1, 0]        # dropped by read_points skip_nans
    scans[1][1] = [0.05, 0.05, 0.0, 1.0]   # dropped by filter_points (<0.3 m)
    out = str(tmp_path / "7.bag")
    assert eks.write_bag(scans, out) == 3
    open(out, "wb").close()                 # glob needs the file on disk

    from delora_tpu.data.rosbag import RosbagSequenceReader

    reader = RosbagSequenceReader(str(tmp_path), 7, topic="/velodyne_points")
    assert reader._bag_path == out
    assert len(reader) == 3
    read = list(reader)
    assert [s.shape for s in read] == [(50, 3), (48, 3), (50, 3)]
    np.testing.assert_allclose(read[0], scans[0][:, :3], atol=1e-6)
    np.testing.assert_allclose(read[1], scans[1][2:, :3], atol=1e-6)

    # Wrong topic -> zero messages, same as rosbag's topic filtering.
    empty = RosbagSequenceReader(str(tmp_path), 7, topic="/other")
    assert len(empty) == 0 and list(empty) == []
