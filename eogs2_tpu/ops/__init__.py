from eogs2_tpu.ops.sh import eval_sh, RGB2SH, SH2RGB  # noqa: F401
from eogs2_tpu.ops.gaussians import (  # noqa: F401
    quat_to_rotmat,
    build_cov3d,
    strip_symmetric,
)
from eogs2_tpu.ops.projection import preprocess_gaussians  # noqa: F401
