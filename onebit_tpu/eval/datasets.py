"""PPL evaluation corpora: exact reference tokenization protocols.

Reference (evaluation/lm_eval/datautils.py):

* **wikitext2** (:35-54): test split joined with "\\n\\n", tokenized whole.
* **c4** (:86-127): the eval stream is 256 random ``seqlen+``-windows (seed
  0) drawn from validation docs long enough to hold ``seqlen+1`` tokens,
  hstacked into one stream.
* **ptb** variants analogous (train/val joined).

All loaders return a flat int32 token array ready for
``onebit_tpu.eval.ppl.perplexity``.  HF ``datasets`` downloads require
network; every loader also accepts a local path (``load_from_disk`` dir or
a raw text/jsonl file), mirroring the reference's local-disk c4
(:86-87, :153-154).
"""

from __future__ import annotations

import json
import os
import random
from typing import Callable, List, Optional

import numpy as np


def _load_texts(source, split: str, text_column: str = "text") -> List[str]:
    """source: HF dataset name tuple, load_from_disk dir, or text file."""
    if isinstance(source, (tuple, list)):
        import datasets
        ds = datasets.load_dataset(*source, split=split)
        return list(ds[text_column])
    if os.path.isdir(source):
        import datasets
        ds = datasets.load_from_disk(source)
        if hasattr(ds, "keys") and split in getattr(ds, "keys", lambda: [])():
            ds = ds[split]
        return list(ds[text_column])
    if source.endswith(".jsonl"):
        with open(source) as f:
            return [json.loads(line)[text_column] for line in f]
    with open(source) as f:
        return [f.read()]


def wikitext2_tokens(tokenize: Callable, source=None,
                     split: str = "test") -> np.ndarray:
    """"\\n\\n".join(test split) tokenized whole (datautils.py:38-42)."""
    source = source or ("wikitext", "wikitext-2-raw-v1")
    texts = _load_texts(source, split)
    return np.asarray(tokenize("\n\n".join(texts)), np.int32)


def c4_eval_tokens(tokenize: Callable, source, *, seqlen: int = 2048,
                   n_windows: int = 256, seed: int = 0) -> np.ndarray:
    """256 random seqlen windows from long-enough val docs, concatenated
    (datautils.py:113-127: seed 0, while-loop resampling)."""
    texts = _load_texts(source, "validation")
    rng = random.Random(seed)
    windows = []
    for _ in range(n_windows):
        while True:
            i = rng.randint(0, len(texts) - 1)
            toks = tokenize(texts[i])
            if len(toks) >= seqlen + 1:
                break
        i = rng.randint(0, len(toks) - seqlen - 1)
        windows.append(toks[i:i + seqlen])
    return np.concatenate([np.asarray(w, np.int32) for w in windows])


def ptb_tokens(tokenize: Callable, source=None,
               split: str = "test") -> np.ndarray:
    """" ".join(sentence) tokenized whole (datautils.py ptb_new path)."""
    source = source or ("ptb_text_only", "penn_treebank")
    texts = _load_texts(source, split, text_column="sentence")
    return np.asarray(tokenize(" ".join(texts)), np.int32)
