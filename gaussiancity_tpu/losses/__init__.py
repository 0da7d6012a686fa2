from gaussiancity_tpu.losses.gan import gan_loss  # noqa: F401
from gaussiancity_tpu.losses.perceptual import PerceptualLoss  # noqa: F401
from gaussiancity_tpu.losses.smoothness import smoothness_loss  # noqa: F401


def masked_l1(a, b, mask=None):
    """Masked L1 (reference: core/train.py:111,285 uses plain L1 on
    mask-multiplied images)."""
    import jax.numpy as jnp

    if mask is not None:
        a = a * mask
        b = b * mask
    return jnp.mean(jnp.abs(a - b))
