"""KD training loop: sharded optax AdamW over the (data, model) mesh.

Replaces the reference's HF ``Trainer`` + DeepSpeed ZeRO-3 stack
(llama_factory/llamafactory/kd.py:195-240, scripts/ds_config.json) with a
single jit'd SPMD train step:

* only BitLinear params train (latent weight, weight_scale, input_factor) —
  embeddings, lm_head and all norm weights are frozen via an optax mask,
  matching the reference's ``requires_grad=False`` wiring
  (modeling_bitllama.py:1053, 1345-1347, :73);
* AdamW betas (0.9, 0.98), weight decay 0.01, cosine schedule with warmup
  (scripts/llama_7b.sh:43-47);
* teacher forward runs inside the same jit program (no_grad via
  ``stop_gradient`` — it has no trainable leaves anyway);
* optimizer state inherits param shardings ⇒ ZeRO-3-style sharding for free.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from onebit_tpu.kernels.bitlinear import BitLinearWeights
from onebit_tpu.model import bitllama
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.train.losses import KDConfig, kd_total_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer/schedule hyperparameters (defaults = scripts/llama_7b.sh)."""
    learning_rate: float = 4e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.98
    weight_decay: float = 0.01
    warmup_steps: int = 500
    total_steps: int = 100_000
    max_grad_norm: float = 1.0
    lr_schedule: str = "cosine"   # "cosine" | "constant"
    min_lr_ratio: float = 0.0
    grad_accum_steps: int = 1     # reference llama_7b.sh:36 uses 4
    remat: bool = False           # gradient checkpointing (core.py:254-263)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def trainable_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True for trainable leaves: only BitLinear float params (latent weight,
    weight_scale, input_factor, bias).  Everything else — embeddings,
    lm_head, norm weights, packed int planes — is frozen."""
    def mask_layers(val):
        if isinstance(val, BitLinearWeights):
            return jax.tree.map(
                lambda x: bool(jnp.issubdtype(jnp.asarray(x).dtype,
                                              jnp.floating)), val)
        return jax.tree.map(lambda x: False, val)

    return {
        "embed_tokens": False,
        "lm_head": False,
        "final_norm": False,
        "layers": {k: mask_layers(v) for k, v in params["layers"].items()},
    }


def apply_freeze(params: Dict[str, Any], mask: Dict[str, Any]):
    """stop_gradient on frozen leaves so XLA drops their backward compute."""
    return jax.tree.map(
        lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask)


def make_schedule(cfg: TrainConfig):
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps, decay_steps=cfg.total_steps,
            end_value=cfg.learning_rate * cfg.min_lr_ratio)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
         optax.constant_schedule(cfg.learning_rate)], [cfg.warmup_steps])


def make_optimizer(cfg: TrainConfig, params: Dict[str, Any]):
    mask = trainable_mask(params)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(make_schedule(cfg), b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                    weight_decay=cfg.weight_decay),
    )
    return optax.masked(tx, mask)


def init_train_state(params: Dict[str, Any], cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    # ZeRO-3 by construction REQUIRES pinning: optax's init materializes
    # moments WITHOUT the params' shardings (measured: SingleDeviceSharding
    # eagerly, replicated under jit — either would OOM a chip at 7B, the
    # exact failure parallel/memplan.py exists to catch).  Every opt-state
    # leaf that mirrors a param shape inherits that param's sharding;
    # scalars (step counts) stay replicated.
    table = {}
    for p in jax.tree.leaves(params):
        if hasattr(p, "sharding") and getattr(p, "shape", ()) != ():
            table.setdefault(p.shape, p.sharding)

    def place(leaf):
        sharding = table.get(getattr(leaf, "shape", ()))
        if sharding is not None and isinstance(
                sharding, jax.sharding.NamedSharding):
            return jax.device_put(leaf, sharding)
        return leaf

    opt_state = jax.tree.map(place, opt_state)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def _build_loss(config: BitLlamaConfig, kd_cfg: KDConfig,
                train_cfg: TrainConfig, compute_dtype):
    """Shared loss plumbing for the train and eval steps: returns
    ``(loss_fn(params, mask, teacher_out, batch), teacher_fwd(teacher_params,
    batch) -> teacher_out|None)``."""
    need_hidden = kd_cfg.kd_beta > 0
    need_attn = kd_cfg.kd_gamma > 0
    use_teacher = kd_cfg.kd_loss_scale > 0 or kd_cfg.kd_beta > 0 \
        or kd_cfg.kd_gamma > 0

    def _unpack_out(out):
        """(logits, hidden?, attn?) per the forward extras convention."""
        if not (need_hidden or need_attn):
            return out, None, None
        items = list(out)
        logits = items.pop(0)
        hidden = items.pop(0) if need_hidden else None
        attn = items.pop(0) if need_attn else None
        return logits, hidden, attn

    def loss_fn(params, mask, teacher_out, batch):
        params = apply_freeze(params, mask)
        out = bitllama.forward(
            params, batch["input_ids"], config, impl="xla",
            attention_mask=batch.get("attention_mask"),
            compute_dtype=compute_dtype, output_hidden_states=need_hidden,
            output_attentions=need_attn, remat=train_cfg.remat)
        student_logits, student_hidden, student_attn = _unpack_out(out)
        if teacher_out is None:
            teacher_logits = jax.lax.stop_gradient(student_logits)
            teacher_hidden = teacher_attn = None
        else:
            teacher_logits, teacher_hidden, teacher_attn = \
                _unpack_out(teacher_out)
        total, metrics = kd_total_loss(
            kd_cfg, student_logits=student_logits,
            teacher_logits=teacher_logits, labels=batch["labels"],
            student_hidden=student_hidden, teacher_hidden=teacher_hidden,
            student_attn=student_attn, teacher_attn=teacher_attn,
            num_layers=config.num_hidden_layers)
        return total, metrics

    def teacher_fwd(teacher_params, batch):
        if not use_teacher:
            # pure-CE stage (SFT / kd_alpha=0 without distillation terms)
            return None
        out = bitllama.forward(
            teacher_params, batch["input_ids"], config, impl="xla",
            attention_mask=batch.get("attention_mask"),
            compute_dtype=compute_dtype,
            output_hidden_states=need_hidden,
            output_attentions=need_attn)
        return jax.lax.stop_gradient(out)

    return loss_fn, teacher_fwd


def make_train_step(config: BitLlamaConfig, kd_cfg: KDConfig,
                    train_cfg: TrainConfig, *, compute_dtype=jnp.bfloat16,
                    donate: bool = True):
    """Build the jit'd KD train step.

    Signature: ``step(state, teacher_params, batch) -> (state, metrics)``
    where ``batch = {"input_ids": [B,S], "labels": [B,S]}``.  The teacher is
    a *packed or dense* BitLlama param tree evaluated without gradients — for
    FP16-teacher parity load the teacher as dense full-precision weights in a
    plain-Llama param tree via ``onebit_tpu.ckpt`` (same pytree layout,
    dense_sign holding real-valued weights would change math, so teacher
    uses ``teacher_forward``).
    """
    accum = max(train_cfg.grad_accum_steps, 1)
    loss_fn, teacher_fwd = _build_loss(config, kd_cfg, train_cfg,
                                       compute_dtype)

    def micro_grads(params, mask, teacher_params, micro_batch):
        teacher_out = teacher_fwd(teacher_params, micro_batch)
        return jax.grad(loss_fn, has_aux=True)(
            params, mask, teacher_out, micro_batch)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, teacher_params, batch):
        mask = trainable_mask(state.params)
        if accum == 1:
            grads, metrics = micro_grads(state.params, mask, teacher_params,
                                         batch)
        else:
            # split the global batch into micro-batches on the leading axis
            micro = jax.tree.map(
                lambda x: x.reshape(accum, x.shape[0] // accum,
                                    *x.shape[1:]), batch)

            def body(carry, mb):
                acc_g, acc_m = carry
                g, m = micro_grads(state.params, mask, teacher_params, mb)
                acc_g = jax.tree.map(jnp.add, acc_g, g)
                acc_m = jax.tree.map(jnp.add, acc_m, m)
                return (acc_g, acc_m), None

            first = jax.tree.map(lambda x: x[0], micro)
            g0, m0 = micro_grads(state.params, mask, teacher_params, first)
            rest = jax.tree.map(lambda x: x[1:], micro)
            (grads, metrics), _ = jax.lax.scan(body, (g0, m0), rest)
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = jax.tree.map(lambda m: m / accum, metrics)

        opt = make_optimizer(train_cfg, state.params)
        updates, new_opt_state = opt.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params=new_params, opt_state=new_opt_state,
                          step=state.step + 1), metrics

    return train_step


def make_eval_step(config: BitLlamaConfig, kd_cfg: KDConfig,
                   train_cfg: TrainConfig, *, compute_dtype=jnp.bfloat16):
    """Loss-only jit step for held-out evaluation during training — the
    reference HF Trainer's eval loop (Seq2SeqTrainingArguments
    ``evaluation_strategy`` path) that the round-1 ``run_kd`` lacked.

    Signature: ``eval_step(params, teacher_params, batch) -> metrics`` (same
    metric keys as the train step, no gradient/optimizer work).
    """
    loss_fn, teacher_fwd = _build_loss(config, kd_cfg, train_cfg,
                                       compute_dtype)

    @jax.jit
    def eval_step(params, teacher_params, batch):
        mask = trainable_mask(params)
        teacher_out = teacher_fwd(teacher_params, batch)
        _, metrics = loss_fn(params, mask, teacher_out, batch)
        return metrics

    return eval_step
