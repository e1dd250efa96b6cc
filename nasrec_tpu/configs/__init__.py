from nasrec_tpu.configs.best_archs import BEST_ARCHS, get_best_arch
