"""vit_cifar_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of mahbodnr/ViT-CIFAR: small Vision Transformers and a zoo of
attention-replacement token mixers trained on CIFAR-10/100 and SVHN.

Design: functional core (flax.linen init/apply, explicit PRNG keys, pytree
state), one typed Config, HBM-resident data with on-device augmentation, one
jitted train step sharded over a `jax.sharding.Mesh` data axis.
"""

from .config import Config, config_from_args

__version__ = "0.1.0"
__all__ = ["Config", "config_from_args"]
