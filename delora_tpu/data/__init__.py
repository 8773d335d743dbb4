from delora_tpu.data.kitti import read_velodyne_bin, KittiSequenceReader  # noqa: F401
from delora_tpu.data.preprocess import Preprocessor  # noqa: F401
from delora_tpu.data.dataset import ScanPairDataset, BatchLoader  # noqa: F401
from delora_tpu.data.pose_data import load_kitti_poses  # noqa: F401
