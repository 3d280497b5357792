"""Byte-pair-encoding tokenization — train on a sample, apply distributed.

The real-token-count upgrade over ``text.bpe_token_count``'s regex
approximation: a from-scratch BPE (Sennrich et al., 2016) with

- ``train_bpe_merges``: merge-table training in pure Python over a
  DETERMINISTIC driver-side sample (hash-ordered). Tokenizer training
  is a driver seam by design — production tokenizers (GPT-2, Llama)
  are trained once on a sample and shipped as a static merge table;
  the distributed work is application, never training.
- ``bpe_encode``: Arrow-batched application over the full corpus via
  ``mapInPandas``. The merge-rank dict rides the task closure (a few
  KB); per-word results are memoized per batch, so cost scales with
  DISTINCT words per batch, not occurrences. Output is corpus-linear
  with zero shuffles.

Genuinely non-SQL-expressible (iterative greedy merging), so the
driver row is rows-only; value-level correctness is pinned by an
independent textbook reimplementation in tests plus reconstruction
invariants (concatenating a word's tokens reproduces the word).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_RE

_WORD_RE = re.compile(TOKEN_RE)
_END = "</w>"


def _words(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def train_bpe_merges(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    sample_docs: int = 256,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a deterministic sample.

    Sample = the ``sample_docs`` docs with smallest xxhash64(text) — a
    stable pseudo-random subset independent of partitioning (same seam
    shape as the PQ codebook sample, similarity.py). Training is the
    textbook frequency-greedy loop with a deterministic (count desc,
    pair lexicographic) tiebreak.
    """
    rows = (
        docs.select(F.col(text_col).alias("t"))
        .orderBy(F.xxhash64(F.col(text_col)), F.col(text_col))
        .limit(sample_docs)
        .collect()
    )
    wf = Counter()
    for r in rows:
        wf.update(_words(r["t"] or ""))
    # each word as a tuple of symbols, seeded at characters + end marker
    splits: dict[str, list[str]] = {w: list(w) + [_END] for w in wf}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in splits.items():
            f = wf[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in splits.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            splits[w] = out
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [_END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens, token_chars, bpe_md5) per doc.

    ``bpe_md5`` = md5 of the space-joined token stream — a value-level
    fingerprint cheap enough to compare in goldens. ``token_chars`` =
    total characters across all emitted tokens: BPE merges only ever
    CONCATENATE symbols, so the mass is exactly sum(len(word) + 4) —
    the 4 is the </w> marker — making losslessness of the merge-table
    application cross-engine checkable (the doc_bpe_encode oracle
    recomputes the same mass from TOKENS_SQL, whose token contract
    _WORD_RE shares). One ``mapInPandas`` pass; the per-batch word
    cache makes cost proportional to distinct words per batch.
    """
    import hashlib

    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}
    id_field = docs.schema[id_col].dataType.simpleString()

    def run(it):
        cache: dict[str, list[str]] = {}
        for pdf in it:
            ids, nw, nt, nc, md5s = [], [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                words = _words(t or "")
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                ids.append(i)
                nw.append(len(words))
                nt.append(len(toks))
                nc.append(sum(len(x) for x in toks))
                md5s.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": nw,
                    "n_bpe_tokens": nt,
                    "token_chars": nc,
                    "bpe_md5": md5s,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run,
        schema=f"{id_col} {id_field}, n_words long, n_bpe_tokens long, "
        "token_chars long, bpe_md5 string",
    )
