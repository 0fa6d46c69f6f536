"""SFT driver: the reference's secondary stage (llamafactory/sft.py).

``run_sft`` = supervised fine-tuning of the (quantized) student on
(prompt, response) pairs with prompt-masked CE — the same sharded train
step as KD with all distillation terms off.  ``save_predictions`` mirrors
CustomSeq2SeqTrainer.save_predictions (sft.py:167-192): greedy-generate on
prompts and dump {"label", "predict"} jsonl.
"""

from __future__ import annotations

import json
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.train.data import prepare_sft_dataset
from onebit_tpu.train.losses import KDConfig
from onebit_tpu.train.run_kd import KDRunConfig, run_kd
from onebit_tpu.train.trainer import TrainConfig, TrainState


def run_sft(config: BitLlamaConfig, params,
            pairs: Sequence[Tuple[str, str]], tokenize: Callable, *,
            cutoff_len: int = 1024, template: str = "vanilla",
            train_cfg: TrainConfig = TrainConfig(),
            run_cfg: KDRunConfig = KDRunConfig()) -> TrainState:
    """Supervised fine-tune on (prompt, response) pairs (CE only)."""
    batch = prepare_sft_dataset(pairs, tokenize, cutoff_len=cutoff_len,
                                eos_id=config.eos_token_id or 2,
                                template=template)
    # run_kd's loop consumes [N, L] blocks with labels==inputs; for SFT we
    # need distinct labels + attention, so feed dict-blocks via a shim.
    import jax
    import jax.numpy as jnp

    from onebit_tpu.parallel.mesh import DATA_AXIS, create_mesh
    from onebit_tpu.train.trainer import init_train_state, make_train_step
    from onebit_tpu.utils.logging import TrainerLog, get_logger

    logger = get_logger(__name__)
    n = len(batch["input_ids"])
    steps_per_epoch = max(n // run_cfg.batch_size, 1)
    total = run_cfg.max_steps or steps_per_epoch * run_cfg.num_epochs
    import dataclasses as _dc
    train_cfg = _dc.replace(train_cfg, total_steps=total)

    state = init_train_state(jax.tree.map(jnp.copy, params), train_cfg)
    step_fn = make_train_step(config, KDConfig(kd_alpha=0.0, kd_beta=0.0,
                                               kd_gamma=0.0,
                                               kd_loss_scale=0.0),
                              train_cfg, compute_dtype=run_cfg.compute_dtype)
    tlog = TrainerLog(run_cfg.output_dir, total)
    rng = np.random.default_rng(run_cfg.seed)
    for step_idx in range(total):
        idx = rng.choice(n, size=run_cfg.batch_size,
                         replace=n < run_cfg.batch_size)
        mb = {k: jnp.asarray(v[idx]) for k, v in batch.items()}
        state, metrics = step_fn(state, None, mb)
        if (step_idx + 1) % run_cfg.log_steps == 0 or step_idx + 1 == total:
            m = {k: float(v) for k, v in metrics.items()}
            tlog.log(step_idx + 1, m)
            logger.info(f"sft step {step_idx + 1}/{total} "
                        f"loss={m['loss']:.4f}")
    return state


def save_predictions(output_dir: str, params, config: BitLlamaConfig,
                     prompts: Sequence[str], labels: Sequence[str],
                     tokenize: Callable, detokenize: Callable, *,
                     max_new_tokens: int = 64,
                     compute_metrics: bool = True) -> str:
    """Greedy-generate per prompt and dump jsonl (reference sft.py:167-192).

    With ``compute_metrics`` (the reference's ComputeMetrics predict stage,
    sft.py:31-68) also writes ``predict_results.json`` holding mean
    rouge-1/2/l and bleu-4 over the (prediction, label) pairs.
    """
    from onebit_tpu.engine.generate import generate
    from onebit_tpu.engine.sampler import SamplingConfig

    os.makedirs(output_dir, exist_ok=True)
    token_prompts = [tokenize(p) for p in prompts]
    outs = generate(params, config, token_prompts,
                    max_new_tokens=max_new_tokens,
                    sampling=SamplingConfig(greedy=True))
    preds = [detokenize(out) for out in outs]
    path = os.path.join(output_dir, "generated_predictions.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        for label, pred in zip(labels, preds):
            f.write(json.dumps({"label": label, "predict": pred},
                               ensure_ascii=False) + "\n")
    if compute_metrics:
        from onebit_tpu.train.gen_metrics import compute_generation_metrics
        metrics = compute_generation_metrics(preds, list(labels))
        with open(os.path.join(output_dir, "predict_results.json"),
                  "w", encoding="utf-8") as f:
            json.dump(metrics, f, indent=2)
    return path
