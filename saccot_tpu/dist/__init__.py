from saccot_tpu.dist.mesh import make_mesh, init_distributed  # noqa: F401
from saccot_tpu.dist.sweep import make_sweep_fn  # noqa: F401
