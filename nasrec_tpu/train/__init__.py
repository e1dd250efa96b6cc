from nasrec_tpu.train.optim import (
    adagrad_init,
    adagrad_update,
    clip_by_global_norm,
    cosine_warmup_restarts,
    constant_with_warmup,
    l2_penalty,
    make_optimizer,
)
from nasrec_tpu.train.metrics import (
    bce_with_logits,
    binary_accuracy,
    auc_exact,
)
from nasrec_tpu.train.loop import (
    TrainState,
    make_train_step,
    make_eval_step,
    train_and_test_one_epoch,
    evaluate_one_epoch,
)
from nasrec_tpu.train.checkpoint import save_checkpoint, load_checkpoint
