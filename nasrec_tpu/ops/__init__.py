"""Searchable operator library (TPU-native, pure-functional).

Each operator is an (init, apply) pair over plain dict pytrees.  Shapes are
computed analytically at build time — the reference's `nn.LazyLinear` shape
inference (ref: nasrec/supernet/modules.py) is replaced by explicit dims.
"""

from nasrec_tpu.ops.common import (
    ACTIVATIONS,
    linear_init,
    linear_apply,
    ln_init,
    ln_apply,
    embedding_init,
)
from nasrec_tpu.ops.linear import (
    elastic_linear_init,
    elastic_linear_apply,
    elastic_linear3d_init,
    elastic_linear3d_apply,
    elastic_linear3d_apply_flat,
)
from nasrec_tpu.ops.interactions import (
    dot_product_init,
    dot_product_apply,
    dot_product_apply_flat,
    sum_init,
    sum_apply,
    sigmoid_gating_init,
    sigmoid_gating_apply,
    fm3d_init,
    fm3d_apply,
    fm3d_apply_flat,
)
from nasrec_tpu.ops.attention import (
    transformer_init,
    transformer_apply,
    transformer_apply_flat,
)
