from nasrec_tpu.search.tokenizer import Tokenizer
from nasrec_tpu.search.evolution import Searcher, SearchConfig
from nasrec_tpu.search.worker import (
    finetune_and_eval_candidates,
    make_candidate_evaluator,
)
