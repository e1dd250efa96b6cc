"""Fixed-subnet / full-supernet training CLI (ref: nasrec/main_train.py).

Examples:
  # Reproduce the published Criteo best model (xlarge space):
  python -m nasrec_tpu.cli.main_train --net supernet-config \
      --supernet_config nasrec_tpu/configs/criteo_xlarge_best.json \
      --root_dir ./data/criteo_kaggle_autoctr --learning_rate 0.16 \
      --train_batch_size 256 --logging_dir ./experiments/criteo_best

  # Built-in published arch by name (no JSON needed):
  python -m nasrec_tpu.cli.main_train --net supernet-config \
      --arch criteo-kaggle/xlarge --data_source synthetic --max_train_steps 50
"""

from __future__ import annotations

import argparse

from nasrec_tpu.choices import load_choice_file
from nasrec_tpu.cli.common import (
    add_data_args,
    add_distributed_args,
    add_train_args,
    data_options,
    maybe_initialize_distributed,
    train_options,
)
from nasrec_tpu.configs import get_best_arch


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    add_train_args(p, lr=0.16)
    add_distributed_args(p)
    p.add_argument("--net", default="supernet-config",
                   choices=["supernet", "supernet-config"])
    p.add_argument("--supernet_config", default=None,
                   help="Path to a best-arch choice JSON (reference schema)")
    p.add_argument("--arch", default=None,
                   help="Built-in arch '<dataset>/<space>', e.g. criteo-kaggle/xlarge")
    p.add_argument("--use_layernorm", type=int, default=0,
                   help="Fixed subnets train with LN off by default (ref: main_train.py:262)")
    p.add_argument("--last_n_blocks_out", type=int, default=1,
                   help="head reads the concat of the last N blocks' outputs "
                        "(ref constructor param: supernet.py:226)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    maybe_initialize_distributed(args)  # before any jax backend use
    from nasrec_tpu.workloads import (
        SupernetOptions,
        train_fixed_subnet,
        train_supernet,
    )

    data = data_options(args)
    train = train_options(args)

    if args.net == "supernet":
        # Train the full supernet path (ref: main_train.py:244-254).
        return train_supernet(
            SupernetOptions(config="xlarge", num_blocks=7, use_layernorm=True,
                            strategy="full-path", supernet_training_steps=0,
                            last_n_blocks_out=args.last_n_blocks_out),
            data, train,
        )

    if args.supernet_config:
        payload = load_choice_file(args.supernet_config)
    elif args.arch:
        dataset, space = args.arch.split("/")
        choice = get_best_arch(dataset, space)
        payload = {**choice, "config": space, "num_blocks": len(choice["macro"])}
    else:
        raise SystemExit("--supernet_config or --arch is required for supernet-config")

    return train_fixed_subnet(
        payload, data, train, use_layernorm=args.use_layernorm == 1,
        use_final_sigmoid=args.use_final_sigmoid == 1,
        last_n_blocks_out=args.last_n_blocks_out,
    )


if __name__ == "__main__":
    main()
