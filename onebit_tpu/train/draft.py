"""Distilled draft-model recipe for speculative decoding.

The serving engine's speculative path (engine/speculative.py,
engine/batching.py ``draft_params``) accepts any draft model that shares
the target's vocabulary.  This module is the recipe that MAKES one:

1. **Slice** ``num_layers`` of the trained 1-bit student's decoder layers
   into a shallow BitLlama (:func:`slice_draft_params`) — embeddings,
   ``lm_head`` and the final norm are shared verbatim (they are frozen in
   OneBit training anyway, reference modeling_bitllama.py:1053,1345-1347),
   so the draft costs only ``num_layers/L`` of the target's sign weights.
2. **Distill** the slice against the full 1-bit student with the existing
   KD machinery (:func:`distill_draft`): the student plays the teacher
   role — ``model.bitllama.forward`` dispatches on the weight type, so a
   quantized (latent or packed) teacher runs its real 1-bit math, and the
   scan-over-layers model makes the trainer depth-agnostic.  Losses are
   logits-level only (``kd_beta = kd_gamma = 0``: hidden states cannot be
   paired layer-by-layer across depths, train/validate.py
   teacher-depth-match).

No reference counterpart: the reference's generation surface is lockstep
HF ``generate`` (SURVEY.md §3.5); speculative serving and its draft recipe
are TPU-engine work.  The 1-bit twist that makes shallow self-drafts
attractive: target verification of ``n`` proposals costs nearly the same
as one decode step (sign-unpack is width-invariant), so the draft only has
to beat ``num_layers/L`` of a decode step in cost — which it does by
construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.kernels.bitlinear import BitLinearWeights
from onebit_tpu.model.config import BitLlamaConfig


def draft_config(config: BitLlamaConfig, num_layers: int) -> BitLlamaConfig:
    """The draft's config: the student's geometry at ``num_layers`` depth."""
    if not 1 <= num_layers <= config.num_hidden_layers:
        raise ValueError(f"num_layers {num_layers} outside "
                         f"[1, {config.num_hidden_layers}]")
    return dataclasses.replace(config, num_hidden_layers=num_layers)


def draft_layer_ids(n_total: int, num_layers: int,
                    strategy: str = "spread") -> Tuple[int, ...]:
    """Which student layers seed the draft.

    ``"first"``: layers ``0 .. num_layers-1`` (the prefix).
    ``"spread"``: evenly spaced ids that always include layer 0 and layer
    ``n_total-1`` — early layers carry token-local features and the last
    layer feeds the shared ``lm_head``, so keeping both ends starts the
    draft's logits far closer to the student's than a prefix slice does.
    """
    if num_layers == n_total:
        return tuple(range(n_total))
    if strategy == "first":
        return tuple(range(num_layers))
    if strategy == "spread":
        if num_layers == 1:
            return (n_total - 1,)
        ids = np.round(np.linspace(0, n_total - 1, num_layers)).astype(int)
        # linspace can collide at tiny n_total; force strictly increasing
        for i in range(1, len(ids)):
            ids[i] = max(ids[i], ids[i - 1] + 1)
        return tuple(int(i) for i in ids)
    raise ValueError(f"unknown strategy {strategy!r}")


def slice_draft_params(params: Dict[str, Any],
                       layer_ids: Sequence[int]) -> Dict[str, Any]:
    """Slice stacked per-layer params (axis 0) at ``layer_ids``; share
    ``embed_tokens`` / ``lm_head`` / ``final_norm`` with the student."""
    ids = jnp.asarray(tuple(layer_ids), jnp.int32)
    out = dict(params)
    out["layers"] = jax.tree.map(lambda a: jnp.take(a, ids, axis=0),
                                 params["layers"])
    return out


def latentize_params(params: Dict[str, Any],
                     init_scale: float = 0.01) -> Dict[str, Any]:
    """Turn a PACKED BitLlama tree into a trainable latent tree:
    ``latent = sign * init_scale`` (the reference's start-checkpoint
    convention, build_start_ckpt.py:33) with ``g``/``h`` kept.  Used when
    the draft is sliced from an inference (packed) checkpoint instead of a
    train (latent) one."""
    from onebit_tpu.core.packing import unpack_signs_device

    def fix(w):
        if isinstance(w, BitLinearWeights) and w.packed is not None:
            latent = unpack_signs_device(w.packed, jnp.float32) * init_scale
            return BitLinearWeights(weight_scale=w.weight_scale,
                                    input_factor=w.input_factor,
                                    latent=latent, bias=w.bias)
        return w

    out = dict(params)
    out["layers"] = {k: fix(v) for k, v in params["layers"].items()}
    return out


def build_draft(params: Dict[str, Any], config: BitLlamaConfig,
                num_layers: int, *, strategy: str = "spread",
                for_training: bool = False
                ) -> Tuple[BitLlamaConfig, Dict[str, Any]]:
    """One-call slice: student (latent or packed) → (draft_config, params).

    ``for_training=True`` latentizes packed slices so the result is a
    trainable start point for :func:`distill_draft`."""
    ids = draft_layer_ids(config.num_hidden_layers, num_layers, strategy)
    d_params = slice_draft_params(params, ids)
    if for_training:
        d_params = latentize_params(d_params)
    return draft_config(config, num_layers), d_params


def distill_draft(student_params: Dict[str, Any], config: BitLlamaConfig,
                  blocks: np.ndarray, *, num_layers: int = 2,
                  strategy: str = "spread",
                  kd_cfg=None, train_cfg=None, run_cfg=None,
                  eval_blocks: Optional[np.ndarray] = None):
    """Distill a ``num_layers`` draft from a trained 1-bit student.

    ``student_params``: the student's TRAIN (latent) or inference (packed)
    tree — it is both the slice source and the KD teacher, so the draft
    learns to imitate the exact model it will draft for.  Returns
    ``(draft_config, TrainState)``; pack the state's params with
    ``model.bitllama.pack_model_params`` for serving.
    """
    from onebit_tpu.train.losses import KDConfig
    from onebit_tpu.train.run_kd import KDRunConfig, run_kd
    from onebit_tpu.train.trainer import TrainConfig

    if kd_cfg is None:
        # logits-only distillation: depths differ, so per-layer hidden /
        # attention pairing is undefined (validate.py teacher-depth-match)
        kd_cfg = KDConfig(kd_alpha=1.0, kd_beta=0.0, kd_gamma=0.0)
    if kd_cfg.kd_beta > 0 or kd_cfg.kd_gamma > 0:
        raise ValueError("draft distillation is logits-only: kd_beta / "
                         "kd_gamma pair per-layer states across unequal "
                         "depths")
    d_config, d_params = build_draft(student_params, config, num_layers,
                                     strategy=strategy, for_training=True)
    state = run_kd(d_config, d_params, student_params, blocks,
                   kd_cfg=kd_cfg,
                   train_cfg=train_cfg or TrainConfig(),
                   run_cfg=run_cfg or KDRunConfig(),
                   eval_blocks=eval_blocks)
    return d_config, state
