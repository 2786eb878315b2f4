from saccot_tpu.slam.posegraph import optimize_pose_graph, PoseGraph  # noqa: F401
from saccot_tpu.slam.ba import bundle_adjust, BAProblem  # noqa: F401
