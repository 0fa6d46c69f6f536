"""KD training driver: the reference's ``run_kd`` (kd.py:195-240) rebuilt.

Wires: dataset pipeline → student/teacher load → sharded train loop with
jsonl logging, periodic checkpointing, resume, and final loss plots.  One
jit'd SPMD step replaces HF Trainer + DeepSpeed ZeRO-3.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.parallel.mesh import DATA_AXIS, create_mesh
from onebit_tpu.parallel.sharding import shard_params
from onebit_tpu.train.data import batch_iterator
from onebit_tpu.train.losses import KDConfig
from onebit_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_train_step,
)
from onebit_tpu.utils.logging import TrainerLog, get_logger, plot_loss

logger = get_logger(__name__)


# -- train-state persistence (resume contract, reference kd.py:221) ---------

def save_train_state(path: str, state: TrainState,
                     sharded: bool = False) -> None:
    """``sharded=True`` writes via orbax: each process writes only its own
    shards (no host gather) — required at 7B+ where fp32 latents + Adam
    moments exceed host RAM (ckpt/sharded.py rationale).  The npz path is
    the small-model default (zero-dep, byte-stable); in a multi-process
    run it gathers each leaf to the hosts (a COLLECTIVE — every process
    must call this function) and process 0 alone writes the file."""
    os.makedirs(path, exist_ok=True)
    if sharded:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(os.path.abspath(path), "train_state"),
                       state, force=True)
        return
    leaves = jax.tree.leaves(state)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        leaves = [multihost_utils.process_allgather(x, tiled=True)
                  for x in leaves]
        if jax.process_index() != 0:
            return
    np.savez(os.path.join(path, "train_state.npz"),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Auto-detects the npz vs sharded layout.  ``template`` supplies the
    pytree structure — and, on the sharded path, the shardings: each array
    is restored DIRECTLY to the template leaf's device placement."""
    npz = os.path.join(path, "train_state.npz")
    if os.path.exists(npz):
        data = np.load(npz)
        treedef = jax.tree.structure(template)
        leaves = [jnp.asarray(data[f"leaf_{i}"])
                  for i in range(len(data.files))]
        return jax.tree.unflatten(treedef, leaves)
    import orbax.checkpoint as ocp
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=getattr(x, "sharding", None)),
        template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.join(os.path.abspath(path), "train_state"), abstract)


def _prune_checkpoints(output_dir: str, keep: int) -> None:
    """Delete all but the newest ``keep`` checkpoint-* dirs (the HF
    Trainer's ``save_total_limit`` rotation)."""
    import re
    import shutil
    entries = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            entries.append((int(m.group(1)), name))
    for _, name in sorted(entries)[:-keep]:
        shutil.rmtree(os.path.join(output_dir, name), ignore_errors=True)
        logger.info(f"pruned {name} (save_total_limit={keep})")


@dataclasses.dataclass
class KDRunConfig:
    output_dir: str = "out"
    batch_size: int = 4
    num_epochs: int = 1
    max_steps: Optional[int] = None
    log_steps: int = 10
    save_steps: int = 5000          # reference llama_7b.sh:46
    mesh_shape: Optional[tuple] = None
    compute_dtype: Any = jnp.bfloat16
    resume_from: Optional[str] = None
    plot: bool = True
    seed: int = 42
    # held-out evaluation (the reference Trainer's eval loop): either pass
    # eval_blocks to run_kd, or set val_split to carve them from `blocks`
    # with train.data.split_dataset semantics (dsets.py:42-63)
    val_split: float = 0.0
    eval_steps: Optional[int] = None   # default: evaluate at save points
    eval_batches: int = 16             # eval subset size cap (batches)
    # orbax sharded train-state checkpoints (no host gather; 7B+ scale)
    sharded_ckpt: bool = False
    # keep only the newest N checkpoint-* dirs (HF Trainer save_total_limit,
    # training_args save_total_limit semantics); None = keep all
    save_total_limit: Optional[int] = None


def run_kd(config: BitLlamaConfig, student_params, teacher_params,
           blocks: np.ndarray, *, kd_cfg: KDConfig = KDConfig(),
           train_cfg: TrainConfig = TrainConfig(),
           run_cfg: KDRunConfig = KDRunConfig(),
           eval_blocks: Optional[np.ndarray] = None) -> TrainState:
    """Train the student against the teacher on pre-chunked token blocks."""
    if eval_blocks is None and run_cfg.val_split > 0:
        from onebit_tpu.train.data import split_dataset
        blocks, eval_blocks = split_dataset(blocks, run_cfg.val_split,
                                            seed=run_cfg.seed)
    steps_per_epoch = len(blocks) // run_cfg.batch_size
    total = run_cfg.max_steps or steps_per_epoch * run_cfg.num_epochs
    train_cfg = dataclasses.replace(train_cfg, total_steps=total)
    if train_cfg.warmup_steps >= total:
        # short runs (smoke tests, tiny corpora) keep the default warmup of
        # 500 (llama_7b.sh:45); clamp rather than reject
        logger.info(f"clamping warmup_steps {train_cfg.warmup_steps} -> "
                    f"{max(total // 10, 1)} (total_steps={total})")
        train_cfg = dataclasses.replace(train_cfg,
                                        warmup_steps=max(total // 10, 1))

    # pre-flight cross-validation (reference get_train_args, core.py:81-215)
    from onebit_tpu.train.validate import validate_train_run
    validate_train_run(config, kd_cfg, train_cfg, run_cfg,
                       n_blocks=len(blocks), block_len=int(blocks.shape[1]))

    mesh_shape = run_cfg.mesh_shape
    if mesh_shape is None:
        import math
        d = math.gcd(jax.device_count(), run_cfg.batch_size)
        mesh_shape = (d, jax.device_count() // d) \
            if jax.device_count() % d == 0 else (d, 1)
    mesh = create_mesh(mesh_shape)
    if run_cfg.batch_size % mesh.shape[DATA_AXIS] != 0:
        raise ValueError(f"batch_size {run_cfg.batch_size} not divisible by "
                         f"data axis {mesh.shape[DATA_AXIS]}")
    if jax.device_count() > 1:
        student_params = shard_params(student_params, mesh)
        teacher_params = shard_params(teacher_params, mesh)
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(DATA_AXIS))

    # copy: the jit step donates its input state buffers, and the caller's
    # student pytree must stay alive (e.g. for a second run / comparison)
    state = init_train_state(jax.tree.map(jnp.copy, student_params),
                             train_cfg)
    if run_cfg.resume_from:
        state = load_train_state(run_cfg.resume_from, state)
        logger.info(f"resumed from {run_cfg.resume_from} at step "
                    f"{int(state.step)}")

    step_fn = make_train_step(config, kd_cfg, train_cfg,
                              compute_dtype=run_cfg.compute_dtype)
    from onebit_tpu.train.trainer import make_eval_step, make_schedule
    schedule = make_schedule(train_cfg)

    eval_fn = None
    if eval_blocks is not None and len(eval_blocks) >= run_cfg.batch_size:
        eval_fn = make_eval_step(config, kd_cfg, train_cfg,
                                 compute_dtype=run_cfg.compute_dtype)

    def run_eval(params):
        """Mean held-out metrics over up to eval_batches batches."""
        sums: Dict[str, float] = {}
        count = 0
        for mb in batch_iterator(eval_blocks, run_cfg.batch_size,
                                 shuffle=False, epochs=1):
            mb = {k: jax.device_put(jnp.asarray(v), batch_sharding)
                  for k, v in mb.items()}
            m = eval_fn(params, teacher_params, mb)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
            if count >= run_cfg.eval_batches:
                break
        return {f"eval_{k}": v / count for k, v in sums.items()}

    # multi-host: exactly one process owns the jsonl log, the npz
    # checkpoint write, and the plots (the reference's rank-0 HF Trainer
    # behavior); orbax sharded checkpoints are written by EVERY process
    # (each saves only its own shards — that is their point)
    is_main = jax.process_index() == 0
    tlog = TrainerLog(run_cfg.output_dir, total) if is_main else None
    start_step = int(state.step)
    it = batch_iterator(blocks, run_cfg.batch_size, seed=run_cfg.seed,
                        epochs=None)
    # skip already-consumed batches on resume
    for _ in range(start_step):
        next(it)

    for step_idx in range(start_step, total):
        batch = next(it)
        batch = {k: jax.device_put(jnp.asarray(v), batch_sharding)
                 for k, v in batch.items()}
        state, metrics = step_fn(state, teacher_params, batch)
        if is_main and ((step_idx + 1) % run_cfg.log_steps == 0
                        or step_idx + 1 == total):
            m = {k: float(v) for k, v in metrics.items()}
            m["learning_rate"] = float(schedule(step_idx))
            entry = tlog.log(step_idx + 1, m,
                             epoch=(step_idx + 1) / max(steps_per_epoch, 1))
            logger.info(
                f"step {step_idx + 1}/{total} loss={m['loss']:.4f} "
                f"kd={m.get('kd_loss', 0):.4f} "
                f"ce={m.get('student_loss', 0):.4f} "
                f"lr={m['learning_rate']:.2e} eta={entry['remaining_time']}")
        eval_every = run_cfg.eval_steps or run_cfg.save_steps
        if eval_fn is not None and ((step_idx + 1) % eval_every == 0
                                    or step_idx + 1 == total):
            em = run_eval(state.params)
            if is_main:
                tlog.log(step_idx + 1, em,
                         epoch=(step_idx + 1) / max(steps_per_epoch, 1))
                logger.info(f"eval step {step_idx + 1}: "
                            f"loss={em.get('eval_loss', float('nan')):.4f}")
        if (step_idx + 1) % run_cfg.save_steps == 0 or step_idx + 1 == total:
            ckpt_dir = os.path.join(run_cfg.output_dir,
                                    f"checkpoint-{step_idx + 1}")
            # every process participates (orbax shard writes / npz
            # allgather are collectives); only process 0 emits files
            # on the npz path
            save_train_state(ckpt_dir, state,
                             sharded=run_cfg.sharded_ckpt)
            if is_main:
                logger.info(f"saved {ckpt_dir}")
            if is_main and run_cfg.save_total_limit:
                _prune_checkpoints(run_cfg.output_dir,
                                   run_cfg.save_total_limit)

    # final PARAMS checkpoint in the loadable native format (the reference
    # Trainer's end-of-run save_pretrained): `convert`/`eval`/`serve`
    # consume this directly — train_state.npz checkpoints are resume
    # state, not a model artifact
    final_dir = os.path.join(run_cfg.output_dir, "final")
    params_out = state.params
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        params_out = jax.tree.map(
            lambda x: multihost_utils.process_allgather(x, tiled=True),
            params_out)
    if is_main:
        from onebit_tpu.ckpt.writer import save_native
        save_native(final_dir, config, params_out)
        logger.info(f"final model → {final_dir}")

    if run_cfg.plot and is_main:
        try:
            plot_loss(run_cfg.output_dir, keys=["loss", "kd_loss",
                                                "student_loss"])
        except Exception as e:  # plotting must never kill a run
            logger.warning(f"plot_loss failed: {e}")
    return state
