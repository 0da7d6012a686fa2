"""gaussiancity_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
generative Gaussian-splatting city generation.

Re-designed from scratch for TPU with the capabilities of
hzxie/GaussianCity (CVPR 2025). See SURVEY.md at the repo root for the
structural map of the reference this build follows.
"""

__version__ = "0.1.0"

from gaussiancity_tpu import config  # noqa: F401
