from nasrec_tpu.parallel.mesh import make_mesh
from nasrec_tpu.parallel.embedding import (
    pad_table_for_sharding,
    make_sharded_stem_lookup,
)
from nasrec_tpu.parallel.train import (
    param_shardings,
    make_parallel_train_step,
    shard_train_state,
)
from nasrec_tpu.parallel.sparse import (
    make_parallel_sparse_train_step,
    make_sharded_packed_stem_lookup,
    pack_table_for_mesh,
    sweep_rows_per_shard,
    unpack_table_from_mesh,
)
