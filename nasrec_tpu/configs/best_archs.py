"""Published best one-shot architectures discovered by NASRec's EA search.

Data ported from the reference's best-architecture JSONs
(ref: nasrec/configs/{criteo,avazu,kdd}/ea_*_best_1shot.json) so that users of
the reference can train the exact same discovered subnets here.  All six
archs use num_blocks=7; `search_test_loss` is the weight-shared validation
loss recorded at search time (not the from-scratch result).

Compact row format, one row per block:
    (active_nodes, dense_dim, sparse_dim, interact, deep_fm,
     dense_idx, sparse_idx, dense_left_idx, dense_right_idx)
"""

from __future__ import annotations

from typing import Dict

from nasrec_tpu.choices import Choice

NUM_BLOCKS = 7


def _expand(rows) -> Choice:
    macro, micro = [], []
    for (act, dd, sd, inter, dfm, d_idx, s_idx, l_idx, r_idx) in rows:
        micro.append(
            {
                "active_nodes": list(act),
                "dense_in_dims": dd,
                "sparse_in_dims": sd,
                "dense_sparse_interact": inter,
                "deep_fm": dfm,
            }
        )
        macro.append(
            {
                "dense_idx": list(d_idx),
                "sparse_idx": list(s_idx),
                "dense_left_idx": list(l_idx),
                "dense_right_idx": list(r_idx),
            }
        )
    return {"macro": macro, "micro": micro}


_ARCH_ROWS = {
    # ref: nasrec/configs/criteo/ea_criteo_kaggle_xlarge_best_1shot.json
    ("criteo-kaggle", "xlarge"): [
        ((2, 4), 128, 64, 1, 0, (0,), (0,), (0,), (0,)),
        ((1, 5), 32, 64, 0, 0, (0,), (0,), (0,), (1,)),
        ((1, 5), 768, 32, 0, 1, (1, 2), (2, 1, 0), (1,), (2,)),
        ((2, 5), 768, 48, 1, 0, (0, 3), (0, 2, 1, 3), (2,), (0,)),
        ((0, 5), 16, 16, 0, 1, (4, 0, 3, 2), (2, 3, 0, 1), (3,), (1,)),
        ((0, 4), 768, 16, 1, 0, (4, 0, 5, 3), (4, 1), (2,), (3,)),
        ((0, 4), 128, 48, 0, 1, (0, 3, 2), (3, 1), (6,), (1,)),
    ],
    # ref: nasrec/configs/criteo/ea_criteo_kaggle_autoctr_best_1shot.json
    ("criteo-kaggle", "autoctr"): [
        ((0, 2), 256, 48, 1, 0, (0,), (0,), (0,), (0,)),
        ((1, 2), 1024, 48, 1, 1, (1,), (0, 1), (1,), (0,)),
        ((0, 2), 128, 16, 1, 0, (2, 0), (2, 1, 0), (0,), (0,)),
        ((0, 2), 16, 48, 0, 1, (2,), (0, 2), (1,), (2,)),
        ((1, 2), 128, 32, 0, 0, (0, 2, 4, 3), (4, 2), (2,), (0,)),
        ((0, 2), 16, 64, 1, 0, (5, 2, 0, 1), (5, 2, 1), (3,), (5,)),
        ((0, 2), 1024, 64, 0, 0, (3, 0, 5), (5, 2, 1, 0), (0,), (5,)),
    ],
    # ref: nasrec/configs/avazu/ea_avazu_kaggle_xlarge_best_1shot.json
    ("avazu", "xlarge"): [
        ((1, 4), 32, 48, 1, 0, (0,), (0,), (0,), (0,)),
        ((1, 5), 768, 64, 1, 0, (1, 0), (0, 1), (0,), (0,)),
        ((0, 5), 512, 48, 1, 0, (0,), (0,), (0,), (0,)),
        ((3, 4), 768, 16, 1, 1, (1, 0, 3, 2), (3,), (1,), (0,)),
        ((1, 5), 768, 64, 0, 0, (3, 2, 4), (2,), (0,), (3,)),
        ((2, 5), 1024, 64, 1, 0, (0, 5, 2, 1), (4, 0), (0,), (3,)),
        ((2, 4), 768, 16, 1, 0, (2, 5, 1, 3), (2, 3), (0,), (2,)),
    ],
    # ref: nasrec/configs/avazu/ea_avazu_kaggle_autoctr_best_1shot.json
    ("avazu", "autoctr"): [
        ((1, 2), 512, 64, 1, 0, (0,), (0,), (0,), (0,)),
        ((0, 2), 1024, 48, 1, 0, (0, 1), (0,), (0,), (0,)),
        ((0, 2), 512, 16, 0, 1, (2, 0), (0,), (1,), (2,)),
        ((1, 2), 768, 48, 1, 1, (3,), (0, 3), (2,), (0,)),
        ((0, 2), 128, 16, 1, 1, (0, 2, 3), (0, 1), (2,), (3,)),
        ((0, 2), 128, 64, 1, 0, (4, 1, 3), (0, 1, 3), (0,), (3,)),
        ((0, 2), 512, 32, 1, 1, (5,), (6, 2, 1), (0,), (1,)),
    ],
    # ref: nasrec/configs/kdd/ea_kdd_kaggle_xlarge_best_1shot.json
    ("kdd", "xlarge"): [
        ((1, 4), 128, 48, 1, 0, (0,), (0,), (0,), (0,)),
        ((2, 4), 768, 64, 1, 0, (1,), (1,), (0,), (0,)),
        ((2, 5), 16, 48, 0, 0, (1,), (2, 1), (1,), (0,)),
        ((3, 4), 64, 16, 1, 0, (2, 0, 3), (1,), (2,), (2,)),
        ((3, 5), 64, 48, 0, 0, (0, 1, 2, 4), (0, 2), (0,), (2,)),
        ((0, 5), 128, 32, 0, 1, (4, 3), (5, 1, 4, 0), (4,), (2,)),
        ((2, 5), 768, 16, 1, 0, (5, 3, 1, 6), (3, 5, 4, 1), (5,), (5,)),
    ],
    # ref: nasrec/configs/kdd/ea_kdd_kaggle_autoctr_best_1shot.json
    ("kdd", "autoctr"): [
        ((0, 2), 768, 48, 1, 1, (0,), (0,), (0,), (0,)),
        ((1, 2), 128, 64, 1, 0, (0, 1), (0, 1), (0,), (1,)),
        ((1, 2), 32, 48, 1, 1, (1, 0, 2), (0, 1), (0,), (2,)),
        ((0, 2), 256, 64, 0, 0, (3, 0, 2, 1), (0, 2, 3), (1,), (2,)),
        ((0, 2), 1024, 64, 0, 0, (4, 3), (2, 1, 4, 0), (0,), (2,)),
        ((1, 2), 768, 64, 0, 0, (5, 2, 1), (4, 5), (4,), (5,)),
        ((1, 2), 1024, 48, 1, 0, (3, 4, 6, 2), (2, 0, 1, 4), (0,), (2,)),
    ],
}

# Weight-shared validation losses recorded at search time (for reference only).
SEARCH_TEST_LOSS = {
    ("criteo-kaggle", "xlarge"): 0.4511473774909973,
    ("criteo-kaggle", "autoctr"): 0.4474305510520935,
    ("avazu", "xlarge"): 0.3922766149044037,
    ("avazu", "autoctr"): 0.39075323939323425,
    ("kdd", "xlarge"): 0.15702040493488312,
    ("kdd", "autoctr"): 0.15634232759475708,
}

BEST_ARCHS: Dict[tuple, Choice] = {k: _expand(v) for k, v in _ARCH_ROWS.items()}


def get_best_arch(dataset: str, space: str) -> Choice:
    """Best published one-shot arch for (dataset, space).

    dataset in {criteo-kaggle, avazu, kdd}; space in {xlarge, autoctr}.
    """
    key = (dataset, space)
    if key not in BEST_ARCHS:
        valid = ", ".join(f"{d}/{s}" for d, s in sorted(BEST_ARCHS))
        raise KeyError(f"unknown arch '{dataset}/{space}'; available: {valid}")
    return BEST_ARCHS[key]
