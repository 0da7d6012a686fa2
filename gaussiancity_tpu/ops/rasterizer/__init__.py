from gaussiancity_tpu.ops.rasterizer.api import (  # noqa: F401
    GaussianRasterizerWrapper,
    RenderOutput,
    rasterize,
    rasterize_points14,
    unpack_points14,
)
from gaussiancity_tpu.ops.rasterizer.api import mark_visible  # noqa: F401
from gaussiancity_tpu.ops.rasterizer.sh import (  # noqa: F401
    eval_sh_colors,
    num_sh_coeffs,
)
