"""nasrec_tpu — a TPU-native NAS framework for CTR recommender models.

Brand-new JAX/XLA/Pallas/pjit implementation with the capabilities of
facebookresearch/NasRec (WWW'23): fixed-subnet training, weight-sharing
supernet training with stochastic path sampling, evolutionary search over the
trained supernet, and subnet-from-scratch evaluation on Criteo / Avazu /
KDD-Cup'12.
"""

__version__ = "0.1.0"

from nasrec_tpu.config import (
    DATASETS,
    OPS_CONFIG_LIB,
    PATH_SAMPLING_STRATEGY_LIB,
    DatasetSpec,
    OpsConfig,
)
