from gaussiancity_tpu.models.discriminator import Discriminator  # noqa: F401
from gaussiancity_tpu.models.generator import (  # noqa: F401
    GaussianAttrMLP,
    Generator,
    GlobalEncoder,
    LocalEncoder,
    ModLinear,
    SinCosEncoder,
)
