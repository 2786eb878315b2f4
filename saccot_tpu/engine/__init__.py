from saccot_tpu.engine.sac_cot import register_pair, RegistrationResult  # noqa: F401
from saccot_tpu.engine.svd3 import umeyama  # noqa: F401
from saccot_tpu.engine.icp import IcpParams, icp, icp_batch  # noqa: F401
from saccot_tpu.engine.baselines import (  # noqa: F401
    ransac_register_pair, edge_guided_register_pair, sampler_ablation,
)
