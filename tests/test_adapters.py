"""TorchCausalLM adapter: reference hf-causal surface through our harness."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_torch_lm():
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(vocab_size=97, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=64)
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg).eval()


def _manual_ll(model, ctx, cont):
    ids = torch.tensor([list(ctx) + list(cont)], dtype=torch.long)
    with torch.no_grad():
        lp = torch.log_softmax(model(ids).logits.float(), -1)[0]
    tot, greedy = 0.0, True
    for k, tok in enumerate(cont):
        pos = len(ctx) + k - 1
        tot += float(lp[pos, tok])
        greedy &= int(lp[pos].argmax()) == tok
    return tot, greedy


def test_loglikelihood_matches_manual(tiny_torch_lm):
    from onebit_tpu.eval.adapters import TorchCausalLM
    lm = TorchCausalLM(tiny_torch_lm, max_length=64, batch_size=3)
    rng = np.random.default_rng(0)
    reqs = []
    for _ in range(7):   # odd count -> ragged final batch
        nc = int(rng.integers(2, 9))
        nk = int(rng.integers(1, 5))
        reqs.append((rng.integers(0, 97, nc).tolist(),
                     rng.integers(0, 97, nk).tolist()))
    got = lm.loglikelihood(reqs)
    for (ctx, cont), (score, greedy) in zip(reqs, got):
        want, wgreedy = _manual_ll(tiny_torch_lm, ctx, cont)
        assert score == pytest.approx(want, abs=1e-4)
        assert greedy == wgreedy


def test_rolling_sums_windows(tiny_torch_lm):
    from onebit_tpu.eval.adapters import TorchCausalLM
    lm = TorchCausalLM(tiny_torch_lm, max_length=16)
    doc = list(range(1, 40))   # longer than one window
    (got,) = lm.loglikelihood_rolling([doc])
    from onebit_tpu.eval.rolling import rolling_windows
    want = sum(s for s, _ in
               lm.loglikelihood(rolling_windows(doc, 15)))
    assert got == pytest.approx(want, abs=1e-4)


def test_greedy_until_stops(tiny_torch_lm):
    from onebit_tpu.eval.adapters import TorchCausalLM
    lm = TorchCausalLM(tiny_torch_lm, max_length=64)
    detok = lambda toks: " ".join(f"t{t}" for t in toks)
    (out,) = lm.greedy_until([([1, 2, 3], ["NEVER-APPEARS"])],
                             detokenize=detok, max_new_tokens=4)
    assert len(out.split()) == 4   # budget-bounded

    # stop string = first generated token's text -> truncates to empty
    ids = torch.tensor([[1, 2, 3]], dtype=torch.long)
    with torch.no_grad():
        first = int(tiny_torch_lm(ids).logits[0, -1].argmax())
    (out2,) = lm.greedy_until([([1, 2, 3], [f"t{first}"])],
                              detokenize=detok, max_new_tokens=4)
    assert out2 == ""


def test_harness_end_to_end_with_torch_backend(tiny_torch_lm):
    """evaluate_tasks(lm=TorchCausalLM) runs a multiple-choice task."""
    from onebit_tpu.eval.adapters import TorchCausalLM
    from onebit_tpu.eval.tasks.base import evaluate_tasks
    from onebit_tpu.eval.tasks.suite import PIQA

    docs = [{"goal": f"goal {i}", "sol1": "yes", "sol2": "no", "label": 0}
            for i in range(4)]
    task = PIQA(docs)
    tokenize = lambda s: [(ord(c) % 96) + 1 for c in s][:30]
    res = evaluate_tasks(None, None, [task], tokenize, batch_size=2,
                         lm=TorchCausalLM(tiny_torch_lm, max_length=64))
    assert "acc" in res["piqa"] and 0.0 <= res["piqa"]["acc"] <= 1.0


@pytest.fixture(scope="module")
def tiny_torch_s2s():
    from transformers import T5Config, T5ForConditionalGeneration
    cfg = T5Config(vocab_size=97, d_model=32, d_ff=64, d_kv=8,
                   num_layers=2, num_decoder_layers=2, num_heads=4,
                   decoder_start_token_id=0, pad_token_id=0)
    torch.manual_seed(0)
    return T5ForConditionalGeneration(cfg).eval()


def _manual_s2s_ll(model, ctx, cont):
    """Reference AutoSeq2SeqLM semantics (huggingface.py:437-550): ctx to
    the encoder, cont as decoder labels; sum target log-softmaxes."""
    enc = torch.tensor([list(ctx)], dtype=torch.long)
    lab = torch.tensor([list(cont)], dtype=torch.long)
    with torch.no_grad():
        logits = model(input_ids=enc, labels=lab).logits
    lp = torch.log_softmax(logits.float(), -1)[0]
    tot, greedy = 0.0, True
    for k, tok in enumerate(cont):
        tot += float(lp[k, tok])
        greedy &= int(lp[k].argmax()) == tok
    return tot, greedy


def test_seq2seq_loglikelihood_matches_manual(tiny_torch_s2s):
    from onebit_tpu.eval.adapters import TorchSeq2SeqLM
    lm = TorchSeq2SeqLM(tiny_torch_s2s, max_length=64, batch_size=3)
    rng = np.random.default_rng(1)
    reqs = []
    for _ in range(7):   # ragged final batch + ragged lengths (padding)
        nc = int(rng.integers(2, 9))
        nk = int(rng.integers(1, 5))
        reqs.append((rng.integers(1, 97, nc).tolist(),
                     rng.integers(1, 97, nk).tolist()))
    got = lm.loglikelihood(reqs)
    for (ctx, cont), (score, greedy) in zip(reqs, got):
        want, wgreedy = _manual_s2s_ll(tiny_torch_s2s, ctx, cont)
        assert score == pytest.approx(want, abs=1e-3)
        assert greedy == wgreedy


def test_seq2seq_rolling_and_greedy(tiny_torch_s2s):
    from onebit_tpu.eval.adapters import TorchSeq2SeqLM
    from onebit_tpu.eval.rolling import rolling_windows
    lm = TorchSeq2SeqLM(tiny_torch_s2s, max_length=16)
    doc = list(range(1, 40))
    (got,) = lm.loglikelihood_rolling([doc])
    want = sum(s for s, _ in lm.loglikelihood(rolling_windows(doc, 15)))
    assert got == pytest.approx(want, abs=1e-3)

    detok = lambda toks: " ".join(f"t{t}" for t in toks)
    (out,) = lm.greedy_until([([1, 2, 3], ["NEVER-APPEARS"])],
                             detokenize=detok, max_new_tokens=4)
    assert len(out.split()) <= 4


def test_seq2seq_harness_end_to_end(tiny_torch_s2s):
    from onebit_tpu.eval.adapters import TorchSeq2SeqLM
    from onebit_tpu.eval.tasks.base import evaluate_tasks
    from onebit_tpu.eval.tasks.suite import PIQA

    docs = [{"goal": f"goal {i}", "sol1": "yes", "sol2": "no", "label": 0}
            for i in range(4)]
    task = PIQA(docs)
    tokenize = lambda s: [(ord(c) % 96) + 1 for c in s][:30]
    res = evaluate_tasks(None, None, [task], tokenize, batch_size=2,
                         lm=TorchSeq2SeqLM(tiny_torch_s2s, max_length=64))
    assert "acc" in res["piqa"] and 0.0 <= res["piqa"]["acc"] <= 1.0
