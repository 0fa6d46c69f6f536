"""Command-line pipeline — the reference's scripts/ directory as one CLI.

    python -m onebit_tpu build-start-ckpt TEACHER_DIR OUT_DIR [--method ...]
    python -m onebit_tpu convert TRAIN_CKPT OUT_DIR [--format native|reference]
    python -m onebit_tpu train --student DIR --teacher DIR --data DIR \
        --dataset NAME [hyperparams...]
    python -m onebit_tpu eval --ckpt DIR --tokens FILE.npy [--seqlen 2048]
    python -m onebit_tpu generate --ckpt DIR --prompt "..." [--tokenizer DIR]
    python -m onebit_tpu bench

Mapping to the reference pipeline (SURVEY.md §1 L4):
  build-start-ckpt ↔ scripts/build_start_ckpt.py (SVID init)
  convert          ↔ scripts/convert_llama_to_infer_ckpt.py (bit packing)
  train            ↔ deepspeed train_bash.py --stage kd (llama_factory)
  eval             ↔ evaluation/lm_eval.py (ppl + zero-shot)
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_any_ckpt(path):
    """Sharded (orbax), native dir (params.npz), or reference HF dir."""
    import os
    from onebit_tpu.ckpt.sharded import is_sharded_ckpt, load_sharded
    if is_sharded_ckpt(path):
        return load_sharded(path)
    if os.path.exists(os.path.join(path, "params.npz")):
        from onebit_tpu.ckpt.writer import load_native
        return load_native(path)
    from onebit_tpu.ckpt.hf_reader import load_reference_checkpoint
    return load_reference_checkpoint(path)


def cmd_build_start(args):
    from onebit_tpu.ckpt.writer import save_native
    from onebit_tpu.core.build_start import build_start_params

    loaded = _load_any_ckpt(args.teacher)
    start = build_start_params(loaded["params"], method=args.method,
                               num_iters=args.num_iters)
    save_native(args.out, loaded["config"], start)
    print(f"start checkpoint written to {args.out}")


def cmd_convert(args):
    from onebit_tpu.ckpt.writer import (export_reference_int8, save_native)
    from onebit_tpu.model.bitllama import pack_model_params

    loaded = _load_any_ckpt(args.ckpt)
    packed = pack_model_params(loaded["params"])
    if args.format == "native":
        save_native(args.out, loaded["config"], packed)
    elif args.format == "sharded":
        from onebit_tpu.ckpt.sharded import save_sharded
        save_sharded(args.out, loaded["config"], packed)
    else:
        export_reference_int8(args.out, loaded["config"], packed)
    print(f"packed inference checkpoint ({args.format}) → {args.out}")


def cmd_build_draft(args):
    """Slice a shallow speculative-decoding draft from a student ckpt
    (train/draft.py recipe).  The output is a start point: distill it with
    ``train --student <out> --teacher <student>`` before serving."""
    from onebit_tpu.ckpt.writer import save_native
    from onebit_tpu.train.draft import build_draft

    loaded = _load_any_ckpt(args.student)
    d_config, d_params = build_draft(
        loaded["params"], loaded["config"], args.num_layers,
        strategy=args.strategy, for_training=args.for_training)
    save_native(args.out, d_config, d_params)
    print(f"{args.num_layers}-layer draft ({args.strategy}) → {args.out}")


def _apply_config_file(args, parser):
    """--config FILE (yaml/json): file values become argument defaults
    (reference core.py:50-77 accepts CLI, .yaml or .json)."""
    import json as _json
    if not getattr(args, "config", None):
        return args
    with open(args.config) as f:
        if args.config.endswith((".yaml", ".yml")):
            import yaml
            data = yaml.safe_load(f)
        else:
            data = _json.load(f)
    for key, val in data.items():
        attr = key.replace("-", "_")
        if not hasattr(args, attr):
            raise ValueError(f"unknown config key {key!r}")
        setattr(args, attr, val)
    return args


def _parse_mesh(spec: str):
    """"4x2" → (4, 2)."""
    parts = spec.lower().split("x")
    if len(parts) != 2:
        raise SystemExit(f"--mesh must be DATAxMODEL (e.g. 4x2), got {spec}")
    return (int(parts[0]), int(parts[1]))


def _config_only(args):
    """Model geometry for --dry-compile without materializing weights."""
    import os

    from onebit_tpu.model.config import BitLlamaConfig
    if getattr(args, "model", None):
        return BitLlamaConfig.named(args.model)
    src = getattr(args, "student", None) or getattr(args, "ckpt", None)
    if not src:
        raise SystemExit("--dry-compile needs --model NAME or a checkpoint "
                         "whose config.json supplies the geometry")
    with open(os.path.join(src, "config.json")) as f:
        from onebit_tpu.model.config import BitLlamaConfig
        return BitLlamaConfig.from_dict(json.load(f))


def cmd_train(args):
    import numpy as np

    from onebit_tpu.train.data import load_texts, prepare_kd_dataset
    from onebit_tpu.train.losses import KDConfig
    from onebit_tpu.train.run_kd import KDRunConfig, run_kd
    from onebit_tpu.train.trainer import TrainConfig

    if args.dry_compile:
        # HBM fit validation without hardware (parallel/memplan.py): AOT
        # compile the REAL-geometry sharded train step on a virtual mesh
        # and check XLA's per-chip peak against --hbm-gb.  The role of
        # ZeRO-3's sharding guarantee (reference scripts/ds_config.json),
        # checked before any chip is touched.
        mesh_shape = _parse_mesh(args.mesh)
        from onebit_tpu.parallel.memplan import (dry_compile_train,
                                                 ensure_virtual_devices)
        ensure_virtual_devices(mesh_shape[0] * mesh_shape[1])
        config = _config_only(args)
        report = dry_compile_train(
            config, mesh_shape, args.batch_size, args.cutoff_len,
            train_cfg=TrainConfig(remat=args.remat))
        print(report)
        if args.hbm_gb:
            report.check(args.hbm_gb)
            print(f"fits the {args.hbm_gb:g} GiB/chip budget")
        return

    student = _load_any_ckpt(args.student)
    teacher = _load_any_ckpt(args.teacher)
    config = student["config"]

    if args.tokens:
        blocks = np.load(args.tokens)
    else:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.tokenizer or args.teacher)
        texts = load_texts(args.data, args.dataset)
        blocks = prepare_kd_dataset(
            texts, lambda s: tok(s)["input_ids"], cutoff_len=args.cutoff_len,
            eos_id=config.eos_token_id)
    print(f"dataset: {blocks.shape[0]} blocks × {blocks.shape[1]}")

    kd_cfg = KDConfig(kd_alpha=args.kd_alpha, kd_beta=args.kd_beta,
                      kd_gamma=args.kd_gamma,
                      kd_loss_scale=args.kd_loss_scale)
    train_cfg = TrainConfig(learning_rate=args.learning_rate,
                            warmup_steps=args.warmup_steps,
                            weight_decay=args.weight_decay)
    run_cfg = KDRunConfig(output_dir=args.output_dir,
                          batch_size=args.batch_size,
                          num_epochs=args.num_epochs,
                          max_steps=args.max_steps,
                          save_steps=args.save_steps,
                          save_total_limit=args.save_total_limit,
                          sharded_ckpt=args.sharded_ckpt,
                          resume_from=args.resume_from)
    # student-vs-teacher cross-checks need both configs; run_kd re-validates
    # the rest (reference get_train_args, core.py:81-215)
    from onebit_tpu.train.validate import validate_kd
    validate_kd(kd_cfg, config, teacher["config"])
    run_kd(config, student["params"], teacher["params"], blocks,
           kd_cfg=kd_cfg, train_cfg=train_cfg, run_cfg=run_cfg)


def _engine_consistency_check(loaded, configs, *, max_len: int = 256,
                              n_new: int = 6):
    """Greedy cross-check of the serving-engine paths against flat decode
    (VERDICT r4 item 7: the real-checkpoint gate must exercise the
    quantized-KV dense engine and the paged engine, not just the flat
    scoring path).  The bf16 dense engine — plain AND block-pipelined —
    must reproduce ``generate`` token-for-token; the quantized
    configurations (int8 KT, int4 KT, paged int8) must match its FIRST
    sampled token exactly (prefill
    attends full precision in every engine) and emit only in-vocab
    tokens.  Returns {"ok": 1/0, "<config>": 1/0, ...} so an --expect
    file can pin ``engine_check.ok``."""
    import numpy as np

    from onebit_tpu.engine.batching import ContinuousBatchingEngine
    from onebit_tpu.engine.generate import generate
    from onebit_tpu.engine.sampler import SamplingConfig

    params, config = loaded["params"], loaded["config"]
    rng = np.random.default_rng(0)
    hi = min(config.vocab_size, 1000)
    prompts = [rng.integers(1, hi, n).tolist() for n in (4, 7, 3)]
    greedy = SamplingConfig(greedy=True)
    want = generate(params, config, prompts, max_new_tokens=n_new,
                    sampling=greedy)
    kw = {
        "dense": {},
        "pipelined": dict(block_steps=4, pipeline_blocks=True),
        "kvq": dict(quantized_kv=True),
        "int4": dict(quantized_kv="int4"),
        "paged": dict(paged=True, quantized_kv=True, page_size=16),
    }
    out = {}
    for name in configs:
        eng = ContinuousBatchingEngine(
            params, config, max_batch=2, max_len=max_len, sampling=greedy,
            **kw[name])
        uids = [eng.add_request(p, max_new_tokens=n_new) for p in prompts]
        got = eng.run()
        got = [got[u] for u in uids]
        if name in ("dense", "pipelined"):
            good = got == want
        else:
            good = all(
                g and g[0] == w[0]
                and all(0 <= t < config.vocab_size for t in g)
                for g, w in zip(got, want))
        out[name] = float(good)
        print(f"engine check [{name}]: "
              f"{'OK' if good else 'MISMATCH'}")
    out["ok"] = min(out.values()) if out else 0.0
    return out


def cmd_eval(args):
    import numpy as np

    loaded = _load_any_ckpt(args.ckpt)
    results = {}

    if args.check_engines:
        configs = [c.strip() for c in args.check_engines.split(",")
                   if c.strip()] if args.check_engines != "all" else \
            ["dense", "pipelined", "kvq", "int4", "paged"]
        results["engine_check"] = _engine_consistency_check(loaded, configs)

    if args.tokens:
        from onebit_tpu.eval.ppl import perplexity
        tokens = np.load(args.tokens)
        results["ppl"] = perplexity(
            loaded["params"], loaded["config"], tokens, seqlen=args.seqlen,
            batch_size=args.batch_size, limit=args.limit, progress=True,
            vocab_chunk=args.vocab_chunk)

    if args.corpus:
        # one-command real-checkpoint parity path (SURVEY §7 phase-2 exit
        # criterion): e.g.
        #   python -m onebit_tpu eval --ckpt <packed> --corpus wikitext2 \
        #     --expect expected/onebit_llama_7b.json
        from transformers import AutoTokenizer

        from onebit_tpu.eval.datasets import get_eval_tokens
        from onebit_tpu.eval.ppl import perplexity
        tok = AutoTokenizer.from_pretrained(args.tokenizer or args.ckpt)
        for name in args.corpus.split(","):
            name = name.strip()
            stream = get_eval_tokens(
                name, lambda s: tok(s, add_special_tokens=False)["input_ids"],
                source=args.corpus_source, seqlen=args.seqlen)
            if stream is None:
                print(f"{name}: no eval stream defined (reference parity)")
                continue
            results[f"ppl_{name}"] = perplexity(
                loaded["params"], loaded["config"], stream,
                seqlen=args.seqlen, batch_size=args.batch_size,
                limit=args.limit, progress=True,
                vocab_chunk=args.vocab_chunk)

    if args.wikitext:
        from transformers import AutoTokenizer

        from onebit_tpu.eval.tasks.wikitext import evaluate_wikitext
        tok = AutoTokenizer.from_pretrained(args.tokenizer or args.ckpt)
        with open(args.wikitext) as f:
            pages = f.read().split("\n\n")
        results["wikitext"] = evaluate_wikitext(
            loaded["params"], loaded["config"], pages,
            lambda s: tok(s, add_special_tokens=False)["input_ids"],
            batch_size=args.batch_size)

    if args.tasks:
        from transformers import AutoTokenizer

        from onebit_tpu.eval.tasks.base import evaluate_tasks, make_table
        from onebit_tpu.eval.tasks.mmlu import (SUBJECTS, MMLUSubject,
                                                aggregate_mmlu)
        from onebit_tpu.eval.tasks.registry import (TASK_REGISTRY,
                                                    pattern_match)

        tok = AutoTokenizer.from_pretrained(args.tokenizer or args.ckpt)
        tokenize = lambda s: tok(s, add_special_tokens=False)["input_ids"]
        detokenize = lambda toks: tok.decode(toks)
        names = []
        for pat in (n.strip() for n in args.tasks.split(",")):
            if any(c in pat for c in "*?["):
                names.extend(n for n in pattern_match([pat])
                             if n not in names)
            elif pat not in names:
                names.append(pat)
        tasks = []
        for name in names:
            if name == "hendrycksTest":
                for subject in SUBJECTS:
                    if args.task_source:
                        from onebit_tpu.eval.task_source import load_split
                        rows = load_split(args.task_source,
                                          f"hendrycksTest-{subject}",
                                          "test")
                    else:
                        import datasets
                        rows = list(datasets.load_dataset(
                            "cais/mmlu", subject, split="test"))
                    tasks.append(MMLUSubject(rows, subject))
            elif args.task_source:
                # offline ingestion (eval/task_source.py): local files
                # under --task-source/NAME/, no hub access
                tasks.append(TASK_REGISTRY[name].from_source(
                    args.task_source, name,
                    with_train=args.num_fewshot > 0))
            else:
                tasks.append(TASK_REGISTRY[name].from_datasets())
        decontam = None
        if args.decontaminate:
            # training text(s) to 13-gram-scan against each task's
            # decontamination queries (reference evaluator.py:215-221)
            with open(args.decontaminate) as f:
                decontam = f.read()
        task_results = evaluate_tasks(
            loaded["params"], loaded["config"], tasks, tokenize,
            batch_size=args.batch_size, limit=args.limit,
            num_fewshot=args.num_fewshot, detokenize=detokenize,
            decontamination_ngrams=decontam)
        print(make_table(task_results))
        results.update(task_results)
        mmlu = aggregate_mmlu(task_results)
        if mmlu:
            results["mmlu"] = mmlu

    print(json.dumps(results, default=float))

    if args.expect:
        # pinned-numbers assertion: {"metric": {"value": v, "atol": a}, ...}
        with open(args.expect) as f:
            expected = json.load(f)
        failures = []
        for metric, spec in expected.items():
            if metric.startswith("_"):
                continue  # comment fields
            if metric.split(".")[0] == "engine_check" and \
                    not args.check_engines:
                # the engine gate is opt-in (--check-engines); a pinned
                # engine_check.* must not fail the plain ppl/task
                # expectation run
                print(f"{metric}: SKIPPED (pass --check-engines to "
                      "assert the serving-engine gate)")
                continue
            got = results
            for part in metric.split("."):
                got = got.get(part) if isinstance(got, dict) else None
                if got is None:
                    break
            if got is None:
                failures.append(f"{metric}: MISSING (wanted "
                                f"{spec['value']}±{spec.get('atol', 0.1)})")
                continue
            atol = float(spec.get("atol", 0.1))
            ok = abs(float(got) - float(spec["value"])) <= atol
            line = (f"{metric}: got {float(got):.4f}, want "
                    f"{spec['value']}±{atol} -> {'PASS' if ok else 'FAIL'}")
            print(line)
            if not ok:
                failures.append(line)
        if failures:
            raise SystemExit("expectation failures:\n" + "\n".join(failures))


def cmd_generate(args):
    from onebit_tpu.engine.generate import generate
    from onebit_tpu.engine.sampler import SamplingConfig

    loaded = _load_any_ckpt(args.ckpt)
    if args.tokenizer:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.tokenizer)
        prompt = tok(args.prompt)["input_ids"]
    else:
        prompt = [int(t) for t in args.prompt.split(",")]
    if args.num_beams > 1:
        from onebit_tpu.engine.beam import beam_generate
        out = beam_generate(loaded["params"], loaded["config"], [prompt],
                            num_beams=args.num_beams,
                            max_new_tokens=args.max_new_tokens,
                            length_penalty=args.length_penalty)[0][0][0]
    else:
        sampling = SamplingConfig(greedy=args.greedy,
                                  temperature=args.temperature,
                                  top_k=args.top_k, top_p=args.top_p)
        out = generate(loaded["params"], loaded["config"], [prompt],
                       max_new_tokens=args.max_new_tokens,
                       sampling=sampling)[0]
    if args.tokenizer:
        print(tok.decode(out))
    else:
        print(",".join(map(str, out)))


def cmd_serve(args):
    """Serving over the continuous-batching engine.  Default: one prompt
    per stdin line, completions printed as they finish.  ``--http PORT``:
    HTTP server with POST /generate (sync + ndjson streaming),
    GET /metrics, GET /health (engine/server.py)."""
    from onebit_tpu.engine.batching import ContinuousBatchingEngine
    from onebit_tpu.engine.sampler import SamplingConfig

    if args.dry_compile:
        from onebit_tpu.parallel.memplan import (dry_compile_serve,
                                                 ensure_virtual_devices)
        tp = max(args.tp, 1)
        ensure_virtual_devices(tp)
        report = dry_compile_serve(
            _config_only(args), tp, max_batch=args.max_batch,
            max_len=args.max_len, paged=args.paged,
            page_size=args.page_size)
        print(report)
        if args.hbm_gb:
            report.check(args.hbm_gb)
            print(f"fits the {args.hbm_gb:g} GiB/chip budget")
        return

    loaded = _load_any_ckpt(args.ckpt)
    tok = None
    if args.tokenizer:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.tokenizer)
    sampling = SamplingConfig(greedy=args.greedy,
                              temperature=args.temperature,
                              top_k=args.top_k, top_p=args.top_p)
    if not args.paged and args.prefix_cache:
        raise SystemExit("--prefix-cache requires --paged")
    if not args.paged and args.kv_quant == "fp8":
        raise SystemExit("--kv-quant fp8 requires --paged (dense "
                         "quantized serving uses the int8 transposed-K "
                         "fused kernel; fp8 pools are paged-only)")
    if args.paged and args.kv_quant == "int4":
        raise SystemExit("--kv-quant int4 is dense-engine only (no int4 "
                         "paged pools); drop --paged")
    params = loaded["params"]
    if args.fuse_decode:
        from onebit_tpu.model.bitllama import fuse_for_decode
        params = fuse_for_decode(params, loaded["config"])
    draft_params = draft_config = None
    if args.draft:
        d = _load_any_ckpt(args.draft)
        draft_params, draft_config = d["params"], d["config"]
    tp_mesh = None
    if args.tp > 1:
        if args.fuse_decode:
            raise SystemExit("--tp uses per-projection TP kernels; "
                             "drop --fuse-decode")
        from onebit_tpu.parallel.mesh import create_mesh
        tp_mesh = create_mesh((1, args.tp))
    eng = ContinuousBatchingEngine(
        params, loaded["config"], max_batch=args.max_batch,
        max_len=args.max_len, sampling=sampling,
        block_steps=args.block_steps, paged=args.paged,
        quantized_kv=args.kv_quant or False,
        page_size=args.page_size, prefix_cache=args.prefix_cache,
        prefill_chunk_size=args.prefill_chunk,
        draft_params=draft_params, draft_config=draft_config,
        n_draft=args.n_draft, tp_mesh=tp_mesh,
        pipeline_blocks=args.pipeline_blocks)

    if args.http is not None:
        import time

        from onebit_tpu.engine.server import EngineServer
        server = EngineServer(eng, tokenizer=tok)
        port = server.start(host=args.host, port=args.http)
        print(f"serving on http://{args.host}:{port} "
              "(POST /generate, GET /metrics)", flush=True)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            server.stop()
        return
    prompts = {}
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        toks = (tok(line)["input_ids"] if tok
                else [int(t) for t in line.split(",")])
        uid = eng.add_request(toks, max_new_tokens=args.max_new_tokens)
        prompts[uid] = line
    out = eng.run()
    for uid in sorted(out):
        text = (tok.decode(out[uid]) if tok
                else ",".join(map(str, out[uid])))
        print(json.dumps({"prompt": prompts[uid], "completion": text}))


def cmd_bench(args):
    import bench
    bench.main()


def _add_dist_args(sp):
    """Multi-host launch flags (the reference's deepspeed --hostfile
    surface, scripts/llama_13b.sh + scripts/hostfile): run the SAME
    command on every host with its --process-id; jax.distributed forms the
    global mesh.  ``--distributed`` alone auto-detects the topology from
    the TPU pod metadata (jax.distributed.initialize with no args)."""
    sp.add_argument("--coordinator", help="host:port of process 0 "
                    "(multi-host launch)")
    sp.add_argument("--num-processes", type=int,
                    help="total processes in the multi-host run")
    sp.add_argument("--process-id", type=int,
                    help="this process's rank (0-based)")
    sp.add_argument("--distributed", action="store_true",
                    help="initialize jax.distributed with auto-detected "
                    "TPU-pod topology")


def _maybe_init_distributed(args) -> None:
    """Wire parallel.mesh.initialize_distributed from the CLI flags —
    must run before any jax computation."""
    coord = getattr(args, "coordinator", None)
    nproc = getattr(args, "num_processes", None)
    pid = getattr(args, "process_id", None)
    if getattr(args, "distributed", False) or coord is not None:
        if coord is not None and (nproc is None or pid is None):
            raise SystemExit("--coordinator requires --num-processes and "
                             "--process-id")
        import os

        from onebit_tpu.parallel.mesh import initialize_distributed
        if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
            # CPU multi-process simulation needs the gloo collective
            # backend (tests/test_multiprocess.py pattern)
            import jax
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        initialize_distributed(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)


def build_parser():
    p = argparse.ArgumentParser(prog="onebit_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-start-ckpt", help="SVID init from teacher")
    b.add_argument("teacher")
    b.add_argument("out")
    b.add_argument("--method", default="power", choices=["power", "nmf"])
    b.add_argument("--num-iters", type=int, default=50)
    b.set_defaults(fn=cmd_build_start)

    c = sub.add_parser("convert", help="pack train ckpt for inference")
    c.add_argument("ckpt")
    c.add_argument("out")
    c.add_argument("--format", default="native",
                   choices=["native", "reference", "sharded"])
    c.set_defaults(fn=cmd_convert)

    bd = sub.add_parser("build-draft", help="slice a shallow speculative-"
                        "decoding draft from a student ckpt")
    bd.add_argument("student")
    bd.add_argument("out")
    bd.add_argument("--num-layers", type=int, default=2)
    bd.add_argument("--strategy", default="spread",
                    choices=["first", "spread"])
    bd.add_argument("--for-training", action="store_true",
                    help="latentize packed slices into a trainable start "
                    "point for `train --student <out> --teacher <student>`")
    bd.set_defaults(fn=cmd_build_draft)

    t = sub.add_parser("train", help="KD training")
    t.add_argument("--config", help="yaml/json file of argument values")
    t.add_argument("--student")
    t.add_argument("--teacher")
    t.add_argument("--data")
    t.add_argument("--dataset")
    t.add_argument("--tokens", help="pre-tokenized blocks .npy")
    t.add_argument("--tokenizer")
    t.add_argument("--output-dir", default="out")
    t.add_argument("--cutoff-len", type=int, default=2048)
    t.add_argument("--batch-size", type=int, default=4)
    t.add_argument("--num-epochs", type=int, default=50)
    t.add_argument("--max-steps", type=int)
    t.add_argument("--save-steps", type=int, default=5000)
    t.add_argument("--save-total-limit", type=int, default=None,
                   help="keep only the newest N checkpoints (HF Trainer "
                   "save_total_limit)")
    t.add_argument("--sharded-ckpt", action="store_true",
                   help="orbax sharded train-state checkpoints (no host "
                   "gather; required at 7B+ multi-host)")
    t.add_argument("--resume-from")
    t.add_argument("--learning-rate", type=float, default=4e-4)
    t.add_argument("--warmup-steps", type=int, default=500)
    t.add_argument("--weight-decay", type=float, default=0.01)
    t.add_argument("--kd-alpha", type=float, default=1.0)
    t.add_argument("--kd-beta", type=float, default=1.0)
    t.add_argument("--kd-gamma", type=float, default=0.0)
    t.add_argument("--kd-loss-scale", type=float, default=0.01)
    t.add_argument("--remat", action="store_true",
                   help="rematerialize decoder layers in backward "
                   "(gradient checkpointing, reference core.py:254-263)")
    t.add_argument("--dry-compile", action="store_true",
                   help="AOT-compile the sharded train step at real "
                   "geometry on a virtual mesh and report per-chip HBM "
                   "peak — no weights, no chips")
    t.add_argument("--model", help="named geometry for --dry-compile "
                   "(llama-7b/llama2-7b/llama-13b/llama2-13b)")
    t.add_argument("--mesh", default="4x2",
                   help="DATAxMODEL mesh for --dry-compile (default 4x2)")
    t.add_argument("--hbm-gb", type=float, default=None,
                   help="fail --dry-compile when per-chip peak exceeds "
                   "this budget (v5e: 16)")
    _add_dist_args(t)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="perplexity + zero-shot eval")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--tokens", help="pre-tokenized stream .npy for ppl")
    e.add_argument("--wikitext", help="raw wikitext pages file (rolling "
                   "word/byte perplexity)")
    e.add_argument("--tasks", help="comma list: piqa,arc_easy,arc_challenge,"
                   "boolq,hellaswag,winogrande,lambada_openai,hendrycksTest")
    e.add_argument("--tokenizer")
    e.add_argument("--seqlen", type=int, default=2048)
    e.add_argument("--batch-size", type=int, default=4)
    e.add_argument("--limit", type=int)
    e.add_argument("--corpus", help="comma list of ppl corpora (wikitext2,"
                   "c4,c4_new,ptb,ptb_new) loaded by protocol")
    e.add_argument("--corpus-source", help="local corpus path (text/jsonl/"
                   "load_from_disk dir) for --corpus")
    e.add_argument("--num-fewshot", type=int, default=0)
    e.add_argument("--task-source", help="directory of local task data "
                   "(DIR/NAME/<split>.jsonl|.json|.csv|.parquet or an HF "
                   "save_to_disk dir) — fully offline --tasks evaluation")
    e.add_argument("--vocab-chunk", type=int, default=None,
                   help="stream the ppl lm_head/CE in vocab chunks of this "
                   "size (online logsumexp; cuts peak memory V/chunk-fold)")
    e.add_argument("--decontaminate", help="training text file to 13-gram-"
                   "scan task docs against; adds <metric>_decontaminate "
                   "columns computed over clean docs only")
    e.add_argument("--expect", help="pinned expected-numbers JSON; exits "
                   "nonzero when any metric misses its tolerance")
    e.add_argument("--check-engines", nargs="?", const="all", default=None,
                   help="greedy cross-check of the serving engines against "
                   "flat decode before scoring: 'all' (dense, pipelined, "
                   "int8-KT, int4-KT, paged-int8) or a comma list; adds "
                   "engine_check.* to the results so --expect can pin "
                   "engine_check.ok")
    _add_dist_args(e)
    e.set_defaults(fn=cmd_eval)

    g = sub.add_parser("generate", help="text generation")
    g.add_argument("--ckpt", required=True)
    g.add_argument("--prompt", required=True)
    g.add_argument("--tokenizer")
    g.add_argument("--max-new-tokens", type=int, default=64)
    g.add_argument("--greedy", action="store_true")
    g.add_argument("--num-beams", type=int, default=1)
    g.add_argument("--length-penalty", type=float, default=1.0)
    g.add_argument("--temperature", type=float, default=0.95)
    g.add_argument("--top-k", type=int, default=50)
    g.add_argument("--top-p", type=float, default=0.7)
    g.set_defaults(fn=cmd_generate)

    sv = sub.add_parser("serve", help="continuous-batching serving loop "
                        "(prompts on stdin)")
    sv.add_argument("--ckpt")
    sv.add_argument("--tokenizer")
    sv.add_argument("--max-batch", type=int, default=8)
    sv.add_argument("--max-len", type=int, default=2048)
    sv.add_argument("--max-new-tokens", type=int, default=128)
    sv.add_argument("--greedy", action="store_true")
    sv.add_argument("--temperature", type=float, default=0.95)
    sv.add_argument("--top-k", type=int, default=50)
    sv.add_argument("--top-p", type=float, default=0.7)
    sv.add_argument("--http", type=int, nargs="?", const=8000,
                    help="serve over HTTP on this port (default 8000)")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--block-steps", type=int, default=1,
                    help="decode tokens per device program")
    sv.add_argument("--pipeline-blocks", action="store_true",
                    help="depth-2 block pipelining: dispatch block N+1 "
                         "from block N's device finals, fetch N's tokens "
                         "while N+1 runs (dense/quantized single-device "
                         "block path; token-identical output)")
    sv.add_argument("--fuse-decode", action="store_true",
                    help="fuse qkv/gate+up projections for decode")
    sv.add_argument("--paged", action="store_true",
                    help="paged KV cache (block tables + page pool)")
    sv.add_argument("--kv-quant", choices=["int8", "fp8", "int4"],
                    default=None,
                    help="quantized KV cache: with --paged, int8/fp8 "
                         "pages; without, the dense int8 transposed-K "
                         "cache served by the fused append+attend "
                         "Pallas kernel (deep-context hot path).  int4: "
                         "nibble-packed dense pools — 2x resident "
                         "context in the same bytes at ~0.89x the int8 "
                         "decode rate (non-paged; composes with --tp)")
    sv.add_argument("--page-size", type=int, default=16)
    sv.add_argument("--prefix-cache", action="store_true",
                    help="share full prompt pages across requests "
                         "(requires --paged)")
    sv.add_argument("--draft", help="draft-model ckpt for speculative "
                    "decoding (see build-draft); requires the dense cache")
    sv.add_argument("--n-draft", type=int, default=4,
                    help="proposals per speculative round")
    sv.add_argument("--prefill-chunk", type=int, default=None,
                    help="fixed-shape chunked prefill size")
    sv.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ways (shard_map over the model "
                         "mesh axis; composes with --paged/--kv-quant/"
                         "--prefix-cache/--prefill-chunk/--block-steps)")
    sv.add_argument("--dry-compile", action="store_true",
                    help="AOT-compile the TP decode step at real geometry "
                    "on a virtual mesh and report per-chip HBM peak")
    sv.add_argument("--model", help="named geometry for --dry-compile")
    sv.add_argument("--hbm-gb", type=float, default=None,
                    help="fail --dry-compile when per-chip peak exceeds "
                    "this budget (v5e: 16)")
    _add_dist_args(sv)
    sv.set_defaults(fn=cmd_serve)

    bn = sub.add_parser("bench", help="decode throughput benchmark")
    bn.set_defaults(fn=cmd_bench)
    return p


def main(argv=None):
    from onebit_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    parser = build_parser()
    args = parser.parse_args(argv)
    if getattr(args, "config", None):
        args = _apply_config_file(args, parser)
    if args.fn is cmd_train and not args.dry_compile and \
            (not args.student or not args.teacher):
        parser.error("train requires --student and --teacher "
                     "(via flags or --config)")
    if args.fn is cmd_serve and not args.dry_compile and not args.ckpt:
        parser.error("serve requires --ckpt")
    _maybe_init_distributed(args)
    args.fn(args)


if __name__ == "__main__":
    main()
