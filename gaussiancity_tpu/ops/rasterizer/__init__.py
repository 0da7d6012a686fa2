from gaussiancity_tpu.ops.rasterizer.api import (  # noqa: F401
    GaussianRasterizerWrapper,
    RenderOutput,
    rasterize,
    rasterize_points14,
    unpack_points14,
)
