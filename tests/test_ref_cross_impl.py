"""Cross-implementation parity vs the REFERENCE torch BitLlamaForCausalLMInf.

Until a released OneBit checkpoint can be dropped in (zero-egress env), this
closes the last untested seam end-to-end: the reference's own packed-int8
inference model (transformers fork, models/bitllama/modeling_bitllama.py:1512
+ bitnet.py:71-122) is instantiated at 7B-tiny width with random packed
weights, saved with save_pretrained, and scored with the reference eval
protocol (evaluation/lm_eval.py:93-128 windowing); then OUR reader loads the
same checkpoint directory and the full JAX stack must reproduce (a) the
logits and (b) the windowed perplexity.

The fork runs in a subprocess so its vendored ``transformers`` never
shadows the installed one inside the pytest process.
"""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REF_SRC = "/root/reference/transformers/src"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_SRC),
                                reason="reference fork not mounted")

# runs inside `python -c` with argv[1]=out_dir: builds the tiny Inf model,
# randomizes, saves HF ckpt, dumps logits + reference-protocol ppl
_REF_SCRIPT = r"""
import json, os, sys, types
sys.path.insert(0, "%(ref_src)s")
stub = types.ModuleType("transformers.dependency_versions_check")
stub.dep_version_check = lambda *a, **k: None
sys.modules["transformers.dependency_versions_check"] = stub
import numpy as np
import torch
from transformers.models.bitllama.configuration_bitllama import BitLlamaConfig
from transformers.models.bitllama.modeling_bitllama import BitLlamaForCausalLMInf

out = sys.argv[1]
torch.manual_seed(0)
rng = np.random.default_rng(0)
cfg = BitLlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=160,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=4, max_position_embeddings=128,
                     tie_word_embeddings=False)
model = BitLlamaForCausalLMInf(cfg).eval()
sd = model.state_dict()
new = {}
for k, v in sd.items():
    if v.dtype == torch.int8:
        new[k] = torch.from_numpy(
            rng.integers(-128, 128, size=tuple(v.shape)).astype(np.int8))
    elif k.endswith("weight_scale") or k.endswith("input_factor"):
        new[k] = torch.from_numpy(
            (0.5 + rng.random(tuple(v.shape))).astype(np.float32))
    else:
        new[k] = torch.from_numpy(
            (rng.standard_normal(tuple(v.shape)) * 0.05).astype(np.float32))
model.load_state_dict(new)
model.save_pretrained(out, safe_serialization=False)

seqlen = 32
tokens = rng.integers(0, cfg.vocab_size, size=4 * seqlen).astype(np.int64)
ids = torch.from_numpy(tokens[: 2 * seqlen].reshape(1, -1))
with torch.no_grad():
    logits = model(ids).logits.float().numpy()
np.save(os.path.join(out, "ref_logits.npy"), logits)
np.save(os.path.join(out, "tokens.npy"), tokens)

# reference ppl windowing (evaluation/lm_eval.py:93-128): per window,
# hidden = model.model(batch)[0]; logits = lm_head(hidden);
# loss = CE(shift_logits, shift_labels); nll = loss * seqlen
nlls = []
nsamples = len(tokens) // seqlen
with torch.no_grad():
    for i in range(nsamples):
        batch = torch.from_numpy(
            tokens[i * seqlen:(i + 1) * seqlen].reshape(1, -1))
        hidden = model.model(batch)[0]
        lm_logits = model.lm_head(hidden)
        shift_logits = lm_logits[:, :-1, :]
        shift_labels = batch[:, 1:]
        loss = torch.nn.CrossEntropyLoss()(
            shift_logits.reshape(-1, shift_logits.size(-1)),
            shift_labels.reshape(-1))
        nlls.append(float(loss) * seqlen)
ppl = float(np.exp(np.sum(nlls) / (nsamples * seqlen)))
with open(os.path.join(out, "ref_ppl.json"), "w") as f:
    json.dump({"ppl": ppl, "seqlen": seqlen}, f)
print("REF_OK")
""" % {"ref_src": REF_SRC}


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("refckpt"))
    proc = subprocess.run([sys.executable, "-c", _REF_SCRIPT, out],
                          capture_output=True, text=True, timeout=600)
    assert "REF_OK" in proc.stdout, proc.stderr[-2000:]
    return out


def test_reader_detects_packed(ref_ckpt):
    from onebit_tpu.ckpt.hf_reader import load_reference_checkpoint
    loaded = load_reference_checkpoint(ref_ckpt)
    assert loaded["kind"] == "packed"
    assert loaded["config"].hidden_size == 64


def test_logits_match_reference(ref_ckpt):
    from onebit_tpu.ckpt.hf_reader import load_reference_checkpoint
    from onebit_tpu.model.bitllama import forward
    loaded = load_reference_checkpoint(ref_ckpt)
    tokens = np.load(os.path.join(ref_ckpt, "tokens.npy"))
    ref_logits = np.load(os.path.join(ref_ckpt, "ref_logits.npy"))
    ids = jnp.asarray(tokens[: ref_logits.shape[1]].reshape(1, -1), jnp.int32)
    ours = np.asarray(forward(loaded["params"], ids, loaded["config"],
                              impl="xla", compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref_logits, atol=2e-3, rtol=2e-3)


def test_ppl_matches_reference_protocol(ref_ckpt):
    from onebit_tpu.ckpt.hf_reader import load_reference_checkpoint
    from onebit_tpu.eval.ppl import perplexity
    loaded = load_reference_checkpoint(ref_ckpt)
    tokens = np.load(os.path.join(ref_ckpt, "tokens.npy"))
    with open(os.path.join(ref_ckpt, "ref_ppl.json")) as f:
        ref = json.load(f)
    ours = perplexity(loaded["params"], loaded["config"], tokens,
                      seqlen=ref["seqlen"], batch_size=2, impl="xla",
                      compute_dtype=jnp.float32)
    assert ours == pytest.approx(ref["ppl"], rel=1e-3), (ours, ref["ppl"])
