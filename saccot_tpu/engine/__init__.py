from saccot_tpu.engine.sac_cot import register_pair, RegistrationResult  # noqa: F401
from saccot_tpu.engine.svd3 import umeyama  # noqa: F401
