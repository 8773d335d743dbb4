"""ROS bridge for the streaming odometry engine (optional, import-gated).

Functional twin of the reference ROS node (reference src/ros_utils/
odometry_publisher.py + odometry_integrator.py): subscribe a PointCloud2
topic, run the model on consecutive scan pairs, publish nav_msgs/Odometry on
``/delora/odometry`` (odometry_publisher.py:52) and broadcast the
``world -> lidar`` TF (odometry_integrator.py:41-54) — except the compute is
:class:`delora_tpu.serving.stream.StreamingOdometry` on a TPU host.

ROS is not installed on TPU pods by default; this module degrades to a clear
ImportError message and everything else in delora_tpu works without it. The
transport-free JSONL engine (``delora serve``) remains the primary surface.

Usage (on a ROS-enabled host):
    from delora_tpu.serving.ros_bridge import RosOdometryBridge
    RosOdometryBridge(config, checkpoint="...",
                      lidar_topic="/velodyne_points").spin()
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import rospy
    from geometry_msgs.msg import TransformStamped
    from nav_msgs.msg import Odometry
    from sensor_msgs.msg import PointCloud2
    import sensor_msgs.point_cloud2 as pc2
    import tf2_ros

    ROS_AVAILABLE = True
except ImportError:  # pragma: no cover - exercised only on ROS hosts
    ROS_AVAILABLE = False


def _require_ros():
    if not ROS_AVAILABLE:
        raise ImportError(
            "rospy/tf2_ros not installed — the ROS bridge needs a ROS host. "
            "Use `delora serve` (JSONL over stdin/stdout) on TPU hosts."
        )


def rotmat_to_quat_np(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), numpy.

    Same convention as tf.transformations.quaternion_from_matrix used by the
    reference node (odometry_publisher.py:152-153)."""
    from delora_tpu.utils.poses import rotmat_to_quat_xyzw_np

    return rotmat_to_quat_xyzw_np(R)


class RosOdometryBridge:
    """PointCloud2 in -> Odometry + TF out, at the sensor rate."""

    def __init__(self, config, checkpoint: Optional[str] = None,
                 dataset: str = "kitti",
                 lidar_topic: str = "/velodyne_points",
                 lidar_frame: str = "lidar",
                 world_frame: str = "world",
                 odometry_topic: str = "/delora/odometry"):
        _require_ros()
        from delora_tpu.serving.stream import StreamingOdometry

        self.engine = StreamingOdometry(config, checkpoint=checkpoint,
                                        dataset=dataset)
        self.lidar_frame = lidar_frame
        self.world_frame = world_frame

        rospy.init_node("delora_tpu_odometry", anonymous=True)
        self.pub = rospy.Publisher(odometry_topic, Odometry, queue_size=10)
        self.tf_broadcaster = tf2_ros.TransformBroadcaster()
        self.sub = rospy.Subscriber(
            lidar_topic, PointCloud2, self._callback, queue_size=1,
            buff_size=2 ** 24,
        )

    def _callback(self, msg):  # pragma: no cover - needs a ROS graph
        pts = np.asarray(
            list(pc2.read_points(msg, field_names=("x", "y", "z"),
                                 skip_nans=True)),
            dtype=np.float32,
        )
        out = self.engine.push_scan(pts)
        if out is None:
            return
        T_rel, pose, latency = out
        stamp = msg.header.stamp

        odom = Odometry()
        odom.header.stamp = stamp
        odom.header.frame_id = self.lidar_frame
        q = rotmat_to_quat_np(T_rel[:3, :3])
        odom.pose.pose.position.x = float(T_rel[0, 3])
        odom.pose.pose.position.y = float(T_rel[1, 3])
        odom.pose.pose.position.z = float(T_rel[2, 3])
        (odom.pose.pose.orientation.x, odom.pose.pose.orientation.y,
         odom.pose.pose.orientation.z, odom.pose.pose.orientation.w) = q
        self.pub.publish(odom)

        tfm = TransformStamped()
        tfm.header.stamp = stamp
        tfm.header.frame_id = self.world_frame
        tfm.child_frame_id = self.lidar_frame
        qp = rotmat_to_quat_np(pose[:3, :3])
        tfm.transform.translation.x = float(pose[0, 3])
        tfm.transform.translation.y = float(pose[1, 3])
        tfm.transform.translation.z = float(pose[2, 3])
        (tfm.transform.rotation.x, tfm.transform.rotation.y,
         tfm.transform.rotation.z, tfm.transform.rotation.w) = qp
        self.tf_broadcaster.sendTransform(tfm)

        rospy.loginfo_throttle(
            5.0, f"delora_tpu odometry latency {latency * 1000:.1f} ms"
        )

    def spin(self):  # pragma: no cover
        rospy.spin()
