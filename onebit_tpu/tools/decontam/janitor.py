"""Train/test decontamination: 13-gram overlap scan + window removal.

Capability parity with the reference decontamination subsystem
(evaluation/lm_eval/decontamination/janitor.py): register test-set strings
as contaminant n-grams, then ``clean`` training documents by excising a
window around every contaminated n-gram (dropping documents that are too
dirty).  The hot scanning loop has a native C core (``_janitor_core``,
built from janitor_core.c via build_ext — the reference documents but does
not ship its equivalent pybind11 module) with a pure-Python fallback.
"""

from __future__ import annotations

import pickle
import re
import string
from typing import Iterable, List, Tuple

def _build_native():
    """One-shot lazy build of the C core (setup.py build_ext --inplace) so
    a fresh checkout exercises the native path without a manual
    ``make native`` step; any failure degrades to the pure-Python loop
    with a visible warning (the reference's own fallback is Python,
    janitor.py:8-20 JANITOR_CPP flag).  The build is serialized across
    processes with an flock so parallel test workers don't race the
    compiler over the same build/ tree."""
    import os
    import subprocess
    import sys
    import warnings
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, ".build.lock"), "w") as lockf:
            try:
                import fcntl
                fcntl.flock(lockf, fcntl.LOCK_EX)
            except ImportError:      # non-POSIX: best effort
                pass
            subprocess.run(
                [sys.executable, "setup.py", "build_ext", "--inplace"],
                cwd=here, capture_output=True, timeout=120, check=True)
    except Exception as e:  # toolchain missing, sandbox, …
        warnings.warn(f"decontam C core build failed ({e}); using the "
                      "pure-Python n-gram scanner", RuntimeWarning)
        return None
    import importlib
    try:
        return importlib.import_module(
            "onebit_tpu.tools.decontam._janitor_core")
    except ImportError as e:
        warnings.warn(f"decontam C core import failed after build ({e}); "
                      "using the pure-Python n-gram scanner", RuntimeWarning)
        return None


# The C core is imported if PREBUILT, but never built at import time: a
# build is an up-to-120 s subprocess writing artifacts into the source
# tree — a surprising import-time side effect in read-only installs,
# sandboxes, and parallel test workers (ADVICE r3).  The build is
# deferred to first USE: constructing a Janitor(use_native=True) or
# reading the module's HAVE_NATIVE attribute triggers one attempt.
try:
    from onebit_tpu.tools.decontam import _janitor_core
except ImportError:
    _janitor_core = None
_BUILD_ATTEMPTED = _janitor_core is not None


def native_core():
    """Return the C core module, building it on first use (or None)."""
    global _janitor_core, _BUILD_ATTEMPTED
    if not _BUILD_ATTEMPTED:
        _BUILD_ATTEMPTED = True
        _janitor_core = _build_native()
    return _janitor_core


def __getattr__(name):
    # HAVE_NATIVE stays importable (tests/test_decontam.py skip guards)
    # but now evaluates lazily — reading it is the "first use"
    if name == "HAVE_NATIVE":
        return native_core() is not None
    raise AttributeError(name)


def _py_words_with_indices(s: str) -> Iterable[Tuple[str, int, int]]:
    for m in re.finditer(r"\S+", s):
        yield m.group(0), m.start(), m.end() - 1


class Janitor:
    """13-gram decontaminator (reference defaults, janitor.py:106-120)."""

    def __init__(self, ngram_n: int = 13, window_to_remove: int = 200,
                 too_dirty_cutoff: int = 10,
                 minimum_slice_length: int = 200,
                 delete_chars: str = string.punctuation,
                 use_native: bool = True):
        self.ngram_n = ngram_n
        self.window_to_remove = window_to_remove
        self.too_dirty_cutoff = too_dirty_cutoff
        self.minimum_slice_length = minimum_slice_length
        self.delete_chars = delete_chars
        self.native = use_native and native_core() is not None
        self.dirt_ngrams = set()
        self._table = str.maketrans(
            string.ascii_uppercase, string.ascii_lowercase, delete_chars)

    # -- persistence --------------------------------------------------------
    def save_contamination_ngrams(self, filename: str) -> None:
        with open(filename, "wb") as f:
            pickle.dump(self.dirt_ngrams, f)

    def load_contamination_ngrams(self, filename: str) -> None:
        with open(filename, "rb") as f:
            self.dirt_ngrams = pickle.load(f)

    # -- core ---------------------------------------------------------------
    def normalize(self, s: str) -> str:
        return s.translate(self._table)

    def _ngrams(self, s: str) -> List[str]:
        if self.native:
            return _janitor_core.clean_ngram(s, self.delete_chars,
                                             self.ngram_n)
        words = [self.normalize(w) for w in s.split()]
        return [" ".join(words[i:i + self.ngram_n])
                for i in range(len(words) - self.ngram_n + 1)]

    def _ngrams_with_indices(self, s: str):
        if self.native:
            return _janitor_core.clean_ngram_with_indices(
                s, self.delete_chars, self.ngram_n)
        out = []
        wi = list(_py_words_with_indices(s))
        for i in range(len(wi) - self.ngram_n + 1):
            span = wi[i:i + self.ngram_n]
            ngram = " ".join(self.normalize(w) for w, _, _ in span)
            out.append((ngram, span[0][1], span[-1][2]))
        return out

    def register_contaminant(self, dirt_string: str) -> None:
        self.dirt_ngrams.update(self._ngrams(dirt_string))

    def contamination_count(self, dirty_string: str) -> int:
        """Number of registered dirt n-grams appearing in the string."""
        return sum(1 for g in self._ngrams(dirty_string)
                   if g in self.dirt_ngrams)

    def clean(self, dirty_string: str) -> List[str]:
        """Remove contaminated windows; [] if too dirty (≥cutoff hits)."""
        hits = [(g, s, e) for g, s, e in
                self._ngrams_with_indices(dirty_string)
                if g in self.dirt_ngrams]
        return self._split_chunks(dirty_string, hits)

    def _split_chunks(self, dirty_string: str, dirty_parts) -> List[str]:
        # reference janitor.py:170-187 window-splice logic
        clean_chunks = []
        splice_idx = 0
        end = -1
        for i, (_, start, end) in enumerate(dirty_parts):
            if i >= self.too_dirty_cutoff:
                return []
            start = max(0, start - self.window_to_remove)
            end = min(len(dirty_string), end + self.window_to_remove)
            if start - splice_idx > self.minimum_slice_length:
                clean_chunks.append(dirty_string[splice_idx:start])
            splice_idx = end
        if end < len(dirty_string) - self.minimum_slice_length:
            clean_chunks.append(dirty_string[end + 1:])
        return clean_chunks
