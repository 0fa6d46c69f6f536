"""KD train-step throughput on one chip (tokens/s through the student).

One chip cannot hold a 7B QAT state (fp32 latent weights + Adam moments
~80 GB — that is what the sharded multi-chip path is for), so this
measures a ~1B-geometry student with a same-shape teacher: full KD loss
(KL + CE), frozen-mask AdamW, remat — the production train_step exactly
as run_kd drives it.

Env: ONEBIT_TRAIN_HIDDEN (2048), ONEBIT_TRAIN_LAYERS (16),
ONEBIT_TRAIN_BATCH (4), ONEBIT_TRAIN_SEQ (1024), ONEBIT_SCAN_ITERS (8).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    from onebit_tpu.model.bitllama import init_params
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.train.losses import KDConfig
    from onebit_tpu.train.trainer import (TrainConfig, init_train_state,
                                          make_train_step)

    hidden = int(os.environ.get("ONEBIT_TRAIN_HIDDEN", "2048"))
    layers = int(os.environ.get("ONEBIT_TRAIN_LAYERS", "16"))
    batch = int(os.environ.get("ONEBIT_TRAIN_BATCH", "4"))
    seq = int(os.environ.get("ONEBIT_TRAIN_SEQ", "1024"))
    iters = int(os.environ.get("ONEBIT_SCAN_ITERS", "8"))

    config = BitLlamaConfig.named(
        "tiny", hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=hidden // 128, num_key_value_heads=hidden // 128,
        intermediate_size=int(hidden * 2.6875) // 256 * 256,
        vocab_size=32000, max_position_embeddings=max(seq, 2048))
    student = init_params(config, jax.random.PRNGKey(0), mode="latent",
                          dtype=jnp.float32)
    n_params = sum(x.size for x in jax.tree.leaves(student)) / 1e9
    print(f"# student ~{n_params:.2f}B params, batch {batch} x seq {seq}",
          file=sys.stderr, flush=True)
    teacher = init_params(config, jax.random.PRNGKey(1), mode="linear",
                          dtype=jnp.bfloat16)
    state = init_train_state(student, TrainConfig(remat=True))
    step = make_train_step(config, KDConfig(kd_alpha=1.0, kd_loss_scale=0.01),
                           TrainConfig(remat=True))

    ids = jnp.zeros((batch, seq), jnp.int32)
    batch_d = {"input_ids": ids, "labels": ids}

    state, metrics = step(state, teacher, batch_d)   # compile + warm
    float(metrics["loss"])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, teacher, batch_d)
        float(metrics["loss"])                        # host sync
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    sec = times[1]
    toks = batch * seq
    print(f"KD train step: {sec*1e3:.1f} ms  ({toks/sec:.0f} tok/s/chip, "
          f"~{n_params:.2f}B student + same-size teacher, remat, "
          f"loss={float(metrics['loss']):.3f})", flush=True)


if __name__ == "__main__":
    main()
