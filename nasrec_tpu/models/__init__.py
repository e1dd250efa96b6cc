from nasrec_tpu.models.embedding import (
    embedding_stem_init,
    embedding_stem_apply,
)
from nasrec_tpu.models.supernet import (
    SuperNetConfig,
    supernet_init,
    supernet_apply,
)
from nasrec_tpu.models.fixed import (
    FixedPlan,
    build_fixed_plan,
    fixed_init,
    fixed_apply,
)
