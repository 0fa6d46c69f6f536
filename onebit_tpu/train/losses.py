"""Knowledge-distillation losses, matching the reference KDTrainer.

Reference semantics (llama_factory/llamafactory/kd.py):

* ``kd_kl_loss`` (:34-40): ``KL(log_softmax(student) ‖ softmax(teacher))``
  with torch ``reduction="batchmean"`` — the KL sum over ALL elements divided
  by the size of the **first** dimension (batch), not by tokens.
* ``causal_ce_loss``: the student's own next-token cross-entropy (HF
  ``outputs.loss`` — mean over non-ignored shifted tokens).
* ``hidden_state_loss`` (:85-98): per layer, rows L2-normalized, mean over
  rows of squared L2 distance, summed over layers (``kd_beta``).
* ``attention_map_loss`` (:100-111): same form on attention maps
  (``kd_gamma``).
* total (:80,:97,:110):
  ``alpha·scale·kl + (1-alpha)·ce + beta·pkd + gamma·attn``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100  # HF convention (llamafactory/extras.py IGNORE_INDEX)


@dataclasses.dataclass(frozen=True)
class KDConfig:
    """KD hyperparameters (reference hparams/model_args.py:81-100; script
    defaults from scripts/llama_7b.sh:44-47)."""
    kd_alpha: float = 1.0
    kd_beta: float = 0.0
    kd_gamma: float = 0.0
    kd_loss_scale: float = 1.0


def kd_kl_loss(student_logits, teacher_logits):
    """KL(student ‖ teacher) with torch 'batchmean' reduction semantics."""
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    # sum_x t(x) * (log t(x) - s(x)), summed over everything / batch
    log_t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32), axis=-1)
    kl = jnp.sum(t * (log_t - s))
    return kl / student_logits.shape[0]


def causal_ce_loss(logits, labels, ignore_index: int = IGNORE_INDEX):
    """Shifted next-token CE, mean over valid tokens (HF CausalLM loss)."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def _normalized_rowwise_mse(s, t):
    """mean over rows of ‖normalize(t) - normalize(s)‖², per leading slice."""
    s = s.reshape(s.shape[0], -1, s.shape[-1]).astype(jnp.float32)
    t = t.reshape(t.shape[0], -1, t.shape[-1]).astype(jnp.float32)
    s = s / (jnp.linalg.norm(s, axis=-1, keepdims=True) + 1e-12)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    return jnp.sum(jnp.mean(jnp.sum((t - s) ** 2, axis=-1), axis=-1))


def hidden_state_loss(student_hidden, teacher_hidden, num_layers: int):
    """Normalized per-layer hidden-state MSE (reference kd.py:85-98).

    Inputs are stacked ``[L+1, B, S, D]`` arrays (embeddings + per-layer
    outputs, as returned by ``forward(..., output_hidden_states=True)``).
    Uses slices ``[0:num_layers]`` — the embedding output and the first
    ``num_layers - 1`` layer outputs, exactly like the reference loop
    (kd.py:87-88 indexes ``hidden_states[i]`` for ``i in range(n_layers)``).
    """
    return _normalized_rowwise_mse(student_hidden[:num_layers],
                                   teacher_hidden[:num_layers])


def attention_map_loss(student_attn, teacher_attn, num_layers: int):
    """Attention-map MSE (reference kd.py:100-111), on stacked arrays
    ``[L, B, H, S, T]`` — rows are NOT normalized in the reference."""
    s = student_attn[:num_layers].astype(jnp.float32)
    t = teacher_attn[:num_layers].astype(jnp.float32)
    s = s.reshape(num_layers, -1, s.shape[-1])
    t = t.reshape(num_layers, -1, t.shape[-1])
    return jnp.sum(jnp.mean(jnp.sum((t - s) ** 2, axis=-1), axis=-1))


def kd_total_loss(cfg: KDConfig, *, student_logits, teacher_logits, labels,
                  student_hidden: Optional[Sequence[jax.Array]] = None,
                  teacher_hidden: Optional[Sequence[jax.Array]] = None,
                  student_attn: Optional[jax.Array] = None,
                  teacher_attn: Optional[jax.Array] = None,
                  num_layers: Optional[int] = None):
    """Combined KD objective (reference kd.py:71-111)."""
    kl = kd_kl_loss(student_logits, teacher_logits) if cfg.kd_loss_scale > 0 else 0.0
    ce = causal_ce_loss(student_logits, labels)
    total = cfg.kd_alpha * cfg.kd_loss_scale * kl + (1.0 - cfg.kd_alpha) * ce
    metrics = {"kd_loss": kl, "student_loss": ce}
    if cfg.kd_beta > 0 and student_hidden is not None:
        pkd = hidden_state_loss(student_hidden, teacher_hidden, num_layers)
        total = total + cfg.kd_beta * pkd
        metrics["pkd_loss"] = pkd
    if cfg.kd_gamma > 0 and student_attn is not None:
        attn = attention_map_loss(student_attn, teacher_attn, num_layers)
        total = total + cfg.kd_gamma * attn
        metrics["attn_loss"] = attn
    metrics["loss"] = total
    return total, metrics
