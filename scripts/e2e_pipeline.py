"""End-to-end pipeline proof: SVID → KD → convert → eval as ONE chain
through the CLI commands verbatim (VERDICT r2 item 5).

The reference's whole repo is this pipeline (scripts/llama_7b.sh →
convert_llama_to_infer_ckpt.py → evaluation/lm_eval.py); every stage here
is tested in isolation — this script runs them as one chain with a quality
assertion:

  1. a tiny random TEACHER generates its own corpus (the reference's KD
     data is likewise model-generated, LLM-QAT all_gen_132k);
  2. ``build-start-ckpt`` SVID-initializes the 1-bit student from it;
  3. ``train`` distills (KD loss must FALL);
  4. ``convert`` packs the trained student;
  5. ``eval`` measures held-out ppl of the packed student, which must
     BEAT a random-sign packed baseline (the student actually absorbed
     the teacher's distribution through the 1-bit bottleneck).

Runs on CPU (tiny, ~1 min) or the real TPU:
    python scripts/e2e_pipeline.py [--steps 150] [--out DIR]
Also driven by tests/test_e2e_pipeline.py.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pipeline(workdir: str, *, steps: int = 150, seq: int = 64,
                 n_seqs: int = 96, verbose: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from onebit_tpu.ckpt.writer import save_native
    from onebit_tpu.cli import main as cli
    from onebit_tpu.engine.generate import generate
    from onebit_tpu.engine.sampler import SamplingConfig
    from onebit_tpu.model.bitllama import init_params, pack_model_params
    from onebit_tpu.model.config import BitLlamaConfig

    def log(msg):
        if verbose:
            print(f"[e2e] {msg}", flush=True)

    config = BitLlamaConfig.named("tiny")
    paths = {k: os.path.join(workdir, k) for k in
             ("teacher", "start", "baseline", "train_out", "packed")}

    # 1. teacher + self-generated corpus -----------------------------------
    log("teacher + self-generated corpus")
    teacher = init_params(config, jax.random.PRNGKey(0), mode="linear")
    save_native(paths["teacher"], config, teacher)
    sampling = SamplingConfig(greedy=False, temperature=1.0, top_k=0,
                              top_p=1.0)
    prompts = [[config.bos_token_id, int(t)]
               for t in np.random.RandomState(0).randint(
                   1, config.vocab_size, n_seqs)]
    seqs = generate(teacher, config, prompts, max_new_tokens=seq - 2,
                    sampling=sampling, seed=7)
    rows = []
    for p, s in zip(prompts, seqs):
        row = (p + list(s))[:seq]
        rows.append(row + [config.eos_token_id] * (seq - len(row)))
    blocks = np.asarray(rows, np.int32)
    train_blocks, held = blocks[: n_seqs * 3 // 4], blocks[n_seqs * 3 // 4:]
    np.save(os.path.join(workdir, "train.npy"), train_blocks)
    stream = held.reshape(-1)
    np.save(os.path.join(workdir, "held.npy"), stream)

    # random-sign packed baseline (same geometry, no training signal)
    save_native(paths["baseline"], config, pack_model_params(
        init_params(config, jax.random.PRNGKey(99), mode="latent")))

    # 2. SVID start checkpoint ----------------------------------------------
    log("build-start-ckpt (SVID)")
    cli(["build-start-ckpt", paths["teacher"], paths["start"],
         "--method", "power"])

    # 3. KD training ----------------------------------------------------------
    log(f"train ({steps} steps)")
    cli(["train", "--student", paths["start"], "--teacher",
         paths["teacher"], "--tokens", os.path.join(workdir, "train.npy"),
         "--output-dir", paths["train_out"], "--batch-size", "8",
         "--max-steps", str(steps), "--save-steps", str(steps),
         "--warmup-steps", "10", "--learning-rate", "3e-3",
         "--kd-beta", "0.0"])
    with open(os.path.join(paths["train_out"], "trainer_log.jsonl")) as f:
        entries = [json.loads(line) for line in f]
    losses = [e["loss"] for e in entries if "loss" in e]
    assert len(losses) >= 2, entries
    log(f"loss {losses[0]:.4f} → {losses[-1]:.4f}")
    assert losses[-1] < losses[0], ("KD loss did not fall", losses)

    # 4. pack for inference ---------------------------------------------------
    log("convert (pack)")
    cli(["convert", os.path.join(paths["train_out"], "final"),
         paths["packed"], "--format", "native"])

    # 5. held-out ppl: distilled packed vs random-sign packed ---------------
    from onebit_tpu.eval.ppl import perplexity
    from onebit_tpu.cli import _load_any_ckpt

    def ppl_of(path):
        loaded = _load_any_ckpt(path)
        return perplexity(loaded["params"], loaded["config"], stream,
                          seqlen=seq, batch_size=4)

    ppl_distilled = ppl_of(paths["packed"])
    ppl_random = ppl_of(paths["baseline"])
    log(f"held-out ppl: distilled {ppl_distilled:.2f} vs random-sign "
        f"{ppl_random:.2f}")
    assert ppl_distilled < ppl_random, (ppl_distilled, ppl_random)
    return {"loss_first": losses[0], "loss_last": losses[-1],
            "ppl_distilled": float(ppl_distilled),
            "ppl_random": float(ppl_random)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    workdir = args.out or tempfile.mkdtemp(prefix="onebit_e2e_")
    res = run_pipeline(workdir, steps=args.steps)
    print(json.dumps({"e2e_pipeline": "OK", **res}))


if __name__ == "__main__":
    main()
