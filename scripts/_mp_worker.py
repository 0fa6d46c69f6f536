"""Worker for the multi-process (jax.distributed) CPU simulation.

Each process owns ``--local-devices`` virtual CPU devices; together they
form one global mesh — the TPU-native equivalent of the reference's
2-node deepspeed/NCCL launch (scripts/hostfile, llama_13b.sh), runnable
on one machine.  Invoked by tests/test_multiprocess.py and by
``python -m onebit_tpu`` users following README multi-host docs.
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    args = ap.parse_args()

    # JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count must be
    # in the environment BEFORE the interpreter starts (sitecustomize may
    # import jax); the launcher sets them.
    assert "cpu" in os.environ.get("JAX_PLATFORMS", ""), \
        "launcher must set JAX_PLATFORMS=cpu"
    assert "xla_force_host_platform_device_count" in \
        os.environ.get("XLA_FLAGS", ""), \
        "launcher must set XLA_FLAGS=--xla_force_host_platform_device_count=N"
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from onebit_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator_address=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np

    n_global = jax.device_count()
    n_local = jax.local_device_count()
    assert n_global == args.num_processes * args.local_devices, \
        (n_global, n_local)

    # one sharded KD train step across processes (cross-host collectives)
    from onebit_tpu.model.bitllama import init_params, pack_model_params
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.parallel.mesh import DATA_AXIS, create_mesh
    from onebit_tpu.parallel.sharding import shard_params
    from onebit_tpu.train.losses import KDConfig
    from onebit_tpu.train.trainer import (TrainConfig, init_train_state,
                                          make_train_step)

    mesh = create_mesh((n_global // 2, 2))
    config = BitLlamaConfig.named("tiny")
    student = shard_params(init_params(config, jax.random.PRNGKey(0),
                                       mode="latent"), mesh)
    teacher = shard_params(pack_model_params(
        init_params(config, jax.random.PRNGKey(1), mode="latent")), mesh)
    tr_cfg = TrainConfig(total_steps=4, warmup_steps=0)
    state = init_train_state(student, tr_cfg)
    step = make_train_step(config, KDConfig(kd_beta=1.0), tr_cfg,
                           compute_dtype=jnp.float32, donate=False)
    batch = max(2, mesh.shape[DATA_AXIS])
    ids = jax.random.randint(jax.random.PRNGKey(2), (batch, 16), 0,
                             config.vocab_size)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(DATA_AXIS))
    ids = jax.device_put(ids, sharding)
    _, metrics = step(state, teacher, {"input_ids": ids, "labels": ids})
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"MP_OK pid={args.process_id} global={n_global} "
          f"local={n_local} loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
