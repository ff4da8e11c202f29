"""Device-mesh parallelism: mesh construction, shardings, pjit train steps."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .multiseed import (
    make_multiseed_scanned_train_step,
    multiseed_init,
    multiseed_opt_init,
    seed_shardings,
    unstack_seed,
)
from .pp import (
    make_pp_lm_train_step,
    make_pp_lm_train_step_1f1b,
    merge_gpt_params,
    place_pp_params,
    pp_init_opt_state,
    split_gpt_params,
)
from .tp import (
    TP_RULES_DEFAULT,
    make_tp_classifier_train_step,
    make_tp_lm_train_step,
    tp_init_opt_state,
    tp_param_shardings,
    tp_shard_params,
)
from .train_step import (
    cast_floats,
    make_classifier_eval_step,
    make_classifier_train_step,
    make_imagenet_train_step,
    make_lm_train_step,
    make_scanned_classifier_train_step,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "cast_floats",
    "make_classifier_train_step",
    "make_classifier_eval_step",
    "make_imagenet_train_step",
    "make_scanned_classifier_train_step",
    "make_multiseed_scanned_train_step",
    "multiseed_init",
    "multiseed_opt_init",
    "seed_shardings",
    "unstack_seed",
    "make_lm_train_step",
    "TP_RULES_DEFAULT",
    "tp_param_shardings",
    "tp_shard_params",
    "tp_init_opt_state",
    "make_tp_classifier_train_step",
    "make_tp_lm_train_step",
    "split_gpt_params",
    "merge_gpt_params",
    "place_pp_params",
    "pp_init_opt_state",
    "make_pp_lm_train_step",
    "make_pp_lm_train_step_1f1b",
]
