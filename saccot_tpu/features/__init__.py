from saccot_tpu.features.neighbors import knn  # noqa: F401
from saccot_tpu.features.normals import estimate_normals  # noqa: F401
from saccot_tpu.features.resolution import mesh_resolution  # noqa: F401
from saccot_tpu.features.iss import iss_keypoints  # noqa: F401
from saccot_tpu.features.shot import shot_descriptors  # noqa: F401
from saccot_tpu.features.fpfh import fpfh_descriptors  # noqa: F401
