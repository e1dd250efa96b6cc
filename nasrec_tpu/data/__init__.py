from nasrec_tpu.data.transforms import (
    TRANSFORMS,
    get_transform,
    transform_criteo,
    transform_avazu,
    transform_kdd,
)
from nasrec_tpu.data.pipeline import (
    batch_iterator,
    prefetch,
    shard_paths,
    make_dataset_iterators,
)
from nasrec_tpu.data.synthetic import (
    SyntheticSpec,
    synthetic_arrays,
    synthetic_batches,
)
from nasrec_tpu.data.cache import build_binary_cache, open_binary_cache
