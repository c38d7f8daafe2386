"""Interpolated Kneser-Ney ARPA trainer.

The reference generates a corpus of segment-label sequences
(``lm_generation.py:52-67``) and trains the actual LM *externally* with
kenlm's ``lmplz``.  This module closes that gap so the stack is
self-contained: it estimates an interpolated Kneser-Ney n-gram model (the
same family lmplz implements) and writes a standard ``.arpa`` file loadable
by our scorer *and* by kenlm.

Estimation (per order k, discount D_k from the count-of-counts formula
``D = n1 / (n1 + 2*n2)``, falling back to 0.75):

  P(w|c)  = max(c_k(c,w) - D, 0) / c_k(c,*)  +  bow(c) * P(w | c[1:])
  bow(c)  = D * |{w : c_k(c,w) > 0}| / c_k(c,*)

Highest order uses raw counts; lower orders use continuation counts
(|distinct preceding words|), except n-grams starting with <s>.  The base
distribution is uniform over the vocabulary (incl. </s> and <unk>).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def _discount(counts: Counter) -> float:
    n1 = sum(1 for v in counts.values() if v == 1)
    n2 = sum(1 for v in counts.values() if v == 2)
    if n1 > 0 and (n1 + 2 * n2) > 0:
        d = n1 / (n1 + 2 * n2)
        return min(max(d, 0.1), 0.99)
    return 0.75


def train_arpa(
    sentences: list[str] | list[list[str]],
    out_path: str,
    order: int = 3,
) -> None:
    toks = [
        (s.split() if isinstance(s, str) else list(s)) for s in sentences
    ]
    vocab = sorted({w for sent in toks for w in sent})
    full_vocab = ["<unk>", "<s>", "</s>"] + vocab

    # raw n-gram counts over <s>-padded sentences
    raw: list[Counter] = [Counter() for _ in range(order + 1)]  # raw[k]
    for sent in toks:
        padded = ["<s>"] + sent + ["</s>"]
        for k in range(1, order + 1):
            for i in range(len(padded) - k + 1):
                gram = tuple(padded[i : i + k])
                if k == 1 and gram == ("<s>",):
                    continue  # <s> is context-only
                raw[k][gram] += 1

    # adjusted counts: continuation counts for orders < N (except <s>-initial)
    adj: list[Counter] = [Counter() for _ in range(order + 1)]
    adj[order] = raw[order]
    for k in range(1, order):
        cont = Counter()
        for gram in raw[k + 1]:
            cont[gram[1:]] += 1
        for gram, c in raw[k].items():
            if gram[0] == "<s>":
                adj[k][gram] = c
            else:
                adj[k][gram] = cont.get(gram, c)

    # probabilities bottom-up; base = uniform over *predictable* tokens
    # (everything but <s>, which is context-only and never predicted)
    base = 1.0 / (len(full_vocab) - 1)
    probs: list[dict] = [dict() for _ in range(order + 1)]
    bows: list[dict] = [dict() for _ in range(order + 1)]

    for k in range(1, order + 1):
        d = _discount(adj[k])
        ctx_total = defaultdict(float)
        ctx_types = defaultdict(int)
        for gram, c in adj[k].items():
            ctx_total[gram[:-1]] += c
            ctx_types[gram[:-1]] += 1
        for gram, c in adj[k].items():
            ctx = gram[:-1]
            lam = d * ctx_types[ctx] / ctx_total[ctx]
            lower = probs[k - 1].get(gram[1:], base) if k > 1 else base
            probs[k][gram] = max(c - d, 0.0) / ctx_total[ctx] + lam * lower
        # backoff weight lives on the *context* (a (k-1)-gram)
        for ctx in ctx_total:
            lam = d * ctx_types[ctx] / ctx_total[ctx]
            if k > 1:
                bows[k - 1][ctx] = lam
            else:
                bows[0][()] = lam

    # ensure every vocab word has a unigram (unk, unseen)
    uni_lam = bows[0].get((), 0.5)
    for w in full_vocab:
        gram = (w,)
        if gram not in probs[1]:
            probs[1][gram] = uni_lam * base

    def log10(p: float) -> float:
        return math.log10(max(p, 1e-99))

    with open(out_path, "w") as f:
        f.write("\\data\\\n")
        for k in range(1, order + 1):
            f.write(f"ngram {k}={len(probs[k])}\n")
        f.write("\n")
        for k in range(1, order + 1):
            f.write(f"\\{k}-grams:\n")
            for gram in sorted(probs[k]):
                lp = -99.0 if gram == ("<s>",) else log10(probs[k][gram])
                line = f"{lp:.6f}\t{' '.join(gram)}"
                if k < order and gram in bows[k]:
                    line += f"\t{log10(bows[k][gram]):.6f}"
                f.write(line + "\n")
            f.write("\n")
        f.write("\\end\\\n")


def main(argv=None):
    """CLI: ``python -m pytorch_video_action_tpu.lm.train_arpa corpus.txt
    out.arpa [--order 3]`` — train a Kneser-Ney ARPA model from a text
    corpus (one space-separated sentence per line)."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("corpus", help="text corpus, one sentence per line")
    ap.add_argument("out", help="output .arpa path")
    ap.add_argument("--order", type=int, default=3)
    args = ap.parse_args(argv)
    with open(args.corpus) as f:
        sentences = [line.strip() for line in f if line.strip()]
    import os

    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    train_arpa(sentences, args.out, order=args.order)
    print(f"Trained ARPA LM ({args.order}-gram, {len(sentences)} sentences): "
          f"{args.out}")


if __name__ == "__main__":
    main()
