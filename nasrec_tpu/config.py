"""Dataset and search-space configuration for nasrec_tpu.

TPU-native re-design of the NASRec configuration layer. Capability parity with
the reference (facebookresearch/NasRec):
  - embedding cardinalities per dataset   (ref: nasrec/utils/config.py:17-41)
  - dataset feature counts                (ref: nasrec/torchrec/{criteo,avazu,kdd}.py:35-37)
  - search-space registry `OPS_CONFIG_LIB` (ref: nasrec/supernet/supernet.py:134-178)
  - path-sampling strategy registry        (ref: nasrec/supernet/supernet.py:188-207)

Everything here is static host-side configuration; nothing touches JAX.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

# ---------------------------------------------------------------------------
# Embedding cardinalities.
#
# During supernet search the reference caps tables at 0.5M rows; for final
# (best-model) evaluation the cap is lifted (ref: nasrec/utils/config.py:17-19,
# README.md:83).  We expose the cap as a function instead of module mutation.
# ---------------------------------------------------------------------------

SEARCH_MAX_NUM_EMBEDDINGS = 500_000

# ref: nasrec/utils/config.py:21-23
_RAW_NUM_EMBEDDINGS_CRITEO: Tuple[int, ...] = (
    1461, 584, 10131227, 2202609, 306, 25, 12518, 634,
    4, 93146, 5684, 8351593, 3195, 28, 14993, 5461307,
    11, 5653, 2174, 5, 7046548, 19, 16, 286182, 106, 142573,
)

# ref: nasrec/utils/config.py:30-31
_RAW_NUM_EMBEDDINGS_AVAZU: Tuple[int, ...] = (
    10000, 241, 8, 8, 4738, 7746, 27, 8553, 560, 37, 2686409,
    6729487, 8252, 6, 5, 2627, 9, 10, 436, 5, 69, 173, 61,
)

# ref: nasrec/utils/config.py:37
_RAW_NUM_EMBEDDINGS_KDD: Tuple[int, ...] = (
    26274, 641708, 14848, 22122011, 1188090, 3735797, 2934102, 20004011, 4, 8,
)

NUM_EMBEDDINGS_TEST: Tuple[int, ...] = (100,) * 26  # tiny fake vocab for tests


def capped_vocab_sizes(raw: Sequence[int], cap: int | None) -> Tuple[int, ...]:
    """Apply the search-time vocabulary cap (None = uncapped, final-eval mode)."""
    if cap is None:
        return tuple(int(x) for x in raw)
    return tuple(min(int(x), cap) for x in raw)


# ---------------------------------------------------------------------------
# Dataset feature specs.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Static description of a CTR dataset's feature layout."""

    name: str
    num_dense: int
    num_sparse: int
    raw_vocab_sizes: Tuple[int, ...]
    # Split sizes (train/val/test), ref: nasrec/main_train.py:354-359.
    num_train: int = 0
    num_val: int = 0
    num_test: int = 0

    def vocab_sizes(self, cap: int | None = None) -> Tuple[int, ...]:
        return capped_vocab_sizes(self.raw_vocab_sizes, cap)

    @property
    def num_trainval(self) -> int:
        return self.num_train + self.num_val


DATASETS: Dict[str, DatasetSpec] = {
    # ref feature counts: nasrec/torchrec/criteo.py:35-36
    "criteo-kaggle": DatasetSpec(
        name="criteo-kaggle",
        num_dense=13,
        num_sparse=26,
        raw_vocab_sizes=_RAW_NUM_EMBEDDINGS_CRITEO,
        num_train=36_672_495,
        num_val=4_584_061,
        num_test=4_584_061,
    ),
    # ref: nasrec/torchrec/avazu.py:36-37 (1 pseudo-dense feature, always 0)
    "avazu": DatasetSpec(
        name="avazu",
        num_dense=1,
        num_sparse=23,
        raw_vocab_sizes=_RAW_NUM_EMBEDDINGS_AVAZU,
        num_train=32_343_175,
        num_val=4_042_896,
        num_test=4_042_896,
    ),
    # ref: nasrec/torchrec/kdd.py:36-37
    "kdd": DatasetSpec(
        name="kdd",
        num_dense=3,
        num_sparse=10,
        raw_vocab_sizes=_RAW_NUM_EMBEDDINGS_KDD,
        num_train=119_711_284,
        num_val=14_963_910,
        num_test=14_963_910,
    ),
    # tiny synthetic spec for tests / CI
    "test": DatasetSpec(
        name="test",
        num_dense=13,
        num_sparse=26,
        raw_vocab_sizes=NUM_EMBEDDINGS_TEST,
        num_train=4096,
        num_val=512,
        num_test=512,
    ),
}


# ---------------------------------------------------------------------------
# Search space ("ops config") registry.
#
# Node role groups (ref: nasrec/supernet/supernet.py:116-122):
#   dense-unary  : linear-2d, zeros-2d
#   dense-binary : sum, sigmoid-gating
#   dense-sparse : dot-product
#   sparse       : zeros-3d, transformer, linear-3d
# ---------------------------------------------------------------------------

DENSE_UNARY_NODES = ("linear-2d", "zeros-2d")
DENSE_BINARY_NODES = ("sum", "sigmoid-gating")
DENSE_SPARSE_NODES = ("dot-product",)
SPARSE_NODES = ("zeros-3d", "transformer", "linear-3d")

ALL_NODE_NAMES = DENSE_UNARY_NODES + DENSE_BINARY_NODES + DENSE_SPARSE_NODES + SPARSE_NODES


@dataclasses.dataclass(frozen=True)
class OpsConfig:
    """One search-space definition (ref schema: nasrec/supernet/supernet.py:125-178)."""

    name: str
    node_names: Tuple[str, ...]
    dense_node_dims: Tuple[int, ...]
    sparse_node_dims: Tuple[int, ...]
    dense_nodes: Tuple[int, ...]   # indices into node_names producing 2-D output
    sparse_nodes: Tuple[int, ...]  # indices producing 3-D output
    zero_nodes: Tuple[int, ...]    # indices of zeros nodes

    def __post_init__(self):
        assert len(self.node_names) == self.num_nodes
        for n in self.node_names:
            assert n in ALL_NODE_NAMES, f"unknown node {n}"
        for i in self.dense_nodes:
            assert self.node_names[i] in (
                DENSE_UNARY_NODES + DENSE_BINARY_NODES + DENSE_SPARSE_NODES
            )
        for i in self.sparse_nodes:
            assert self.node_names[i] in SPARSE_NODES

    @property
    def num_nodes(self) -> int:
        return len(self.node_names)

    @property
    def max_dense_dim(self) -> int:
        return max(self.dense_node_dims)

    @property
    def max_sparse_dim(self) -> int:
        return max(self.sparse_node_dims)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


_DENSE_DIMS = (16, 32, 64, 128, 256, 512, 768, 1024)
_SPARSE_DIMS = (16, 32, 48, 64)

OPS_CONFIG_LIB: Dict[str, OpsConfig] = {
    # NASRec-Full space (ref: nasrec/supernet/supernet.py:135-150)
    "xlarge": OpsConfig(
        name="xlarge",
        node_names=(
            "linear-2d", "dot-product", "sigmoid-gating", "sum",
            "transformer", "linear-3d",
        ),
        dense_node_dims=_DENSE_DIMS,
        sparse_node_dims=_SPARSE_DIMS,
        dense_nodes=(0, 1, 2, 3),
        sparse_nodes=(4, 5),
        zero_nodes=(),
    ),
    # ref: nasrec/supernet/supernet.py:151-168
    "xlarge-zeros": OpsConfig(
        name="xlarge-zeros",
        node_names=(
            "linear-2d", "dot-product", "sigmoid-gating", "sum", "zeros-2d",
            "transformer", "zeros-3d", "linear-3d",
        ),
        dense_node_dims=_DENSE_DIMS,
        sparse_node_dims=_SPARSE_DIMS,
        dense_nodes=(0, 1, 2, 3, 4),
        sparse_nodes=(5, 6, 7),
        zero_nodes=(4, 6),
    ),
    # NASRec-Small space (ref: nasrec/supernet/supernet.py:169-177)
    "autoctr": OpsConfig(
        name="autoctr",
        node_names=("linear-2d", "dot-product", "linear-3d"),
        dense_node_dims=_DENSE_DIMS,
        sparse_node_dims=_SPARSE_DIMS,
        dense_nodes=(0, 1),
        sparse_nodes=(2,),
        zero_nodes=(),
    ),
}


# ---------------------------------------------------------------------------
# Path-sampling strategy registry (ref: nasrec/supernet/supernet.py:188-207).
# Each strategy is a (macro, micro) pair.
# ---------------------------------------------------------------------------

PATH_SAMPLING_STRATEGY_LIB: Dict[str, Dict[str, str]] = {
    "default": {"macro": "any-path", "micro": "single-path"},
    "single-path": {"macro": "single-path", "micro": "single-path"},
    "any-path": {"macro": "any-path", "micro": "any-path"},
    "full-path": {"macro": "full-path", "micro": "full-path"},
    "fixed-path": {"macro": "fixed-path", "micro": "fixed-path"},
    "evo-2shot-path": {"macro": "evo-2shot-path", "micro": "evo-2shot-path"},
}

# Dense output of every block is split into this many pseudo-slots when merged
# into the sparse stream (ref: nasrec/supernet/supernet.py:882).
DS_INTERACT_NUM_SPLITS = 8

# Number of attention heads in the Transformer node (ref: nasrec/supernet/modules.py:26).
NUM_MHA_HEADS = 8

# LayerNorm weight init for transformer residual LNs (ref: nasrec/supernet/modules.py:598).
LN_INIT = 0.17

DEFAULT_EMBEDDING_DIM = 16
