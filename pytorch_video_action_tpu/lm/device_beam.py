"""TPU-vectorized LM beam search over segment label sequences.

The reference's beam search (``inference-lm.py:160-168``) is a host-side
Python loop that re-scores every *full prefix string* with kenlm at every
expansion — O(beam * candidates * prefix_len) LM lookups per segment, per
video, serialized on the host.  On TPU we make decoding a batched tensor
program (the direction of the retrieved vectorized-beam-search literature,
PAPERS.md — e.g. FlexCTC's GPU beam decoding):

1. **Densify the LM.**  The vocabulary is tiny (48 labels + <s>, </s>,
   <unk>), so the whole backoff-resolved trigram distribution fits in a
   ``[V, V, V]`` float32 table (~0.5 MB for V=51):
   ``table[c2, c1, w] = log10 P(w | c2, c1)`` with ARPA backoff applied at
   build time.  Scoring any sequence is then pure gathers — bitwise equal to
   ``ArpaLanguageModel.score`` (tested).
2. **Score incrementally.**  kenlm's ``score(prefix)`` = log10 P(prefix </s>)
   differs from the previous step's score by one conditional term plus the
   *moved* </s> term, so the beam carries cumulative no-eos scores and ranks
   by ``cum + logP(</s> | new context)`` — identical ranking to re-scoring
   the full string, without the O(len) rescan.
3. **Batch everything.**  All videos decode simultaneously:
   candidates ``[N, S_max, K]`` (-1 padded), one ``lax.scan`` over the
   segment axis; each step is a ``[N, B, K]`` gather + top-k.  Padded
   segments are identity steps.  Ties resolve like the host's stable
   descending sort (beam-major, candidate-minor order), so results match
   the host beam exactly, not just statistically.

``--device_beam`` on the inference-lm CLI switches this in; the host loop
remains the default (and the oracle in tests/test_lm.py).
"""

from __future__ import annotations

import numpy as np

BOS, EOS, UNK = "<s>", "</s>", "<unk>"


def dense_trigram_table(lm, n_labels: int):
    """Backoff-resolve an ARPA model (order <= 3) into dense tables.

    Returns ``(table [V, V, V] float32, ids: dict word->id)`` where the word
    ids 0..n_labels-1 are the label tokens (str(i)) and the last three ids
    are <s>, </s>, <unk>.  ``table[c2, c1, w] = log10 P(w | c2 c1)``; for
    bigram/unigram models backoff resolution collapses the unused context
    axes automatically.
    """
    if isinstance(lm, str):  # a path: densification needs the pure-Python
        from .arpa import ArpaLanguageModel  # scorer's backoff internals

        lm = ArpaLanguageModel(lm)
    if not hasattr(lm, "_word_logprob"):
        raise TypeError(
            "dense_trigram_table needs an ArpaLanguageModel (or a path); "
            f"got {type(lm).__name__} — pass the .arpa path instead"
        )
    if getattr(lm, "order", 3) > 3:
        raise ValueError(f"device beam supports order<=3 ARPA, got {lm.order}")
    words = [str(i) for i in range(n_labels)] + [BOS, EOS, UNK]
    ids = {w: i for i, w in enumerate(words)}
    v = len(words)
    # the host scorer maps OOV CONTEXT words to <unk> before they enter the
    # context window (arpa.py score(): ``mapped = w if w in vocab else unk``)
    # — the table rows must be built from the same mapped contexts or
    # device/host beams diverge on labels absent from the LM corpus
    ctx_word = lambda w: w if w in lm.vocab else UNK  # noqa: E731
    table = np.empty((v, v, v), np.float32)
    for i2, c2 in enumerate(words):
        for i1, c1 in enumerate(words):
            ctx = (ctx_word(c2), ctx_word(c1))
            for iw, w in enumerate(words):
                table[i2, i1, iw] = lm._word_logprob(ctx, w)
    return table, ids


def device_beam_search(
    table: np.ndarray,
    ids: dict,
    candidates: np.ndarray,
    n_segments: np.ndarray,
    beam_size: int = 5,
) -> list[list[int]]:
    """Decode all videos at once on the accelerator.

    Args:
      table:       ``[V, V, V]`` log10 conditional table from
                   :func:`dense_trigram_table`.
      candidates:  ``[N, S_max, K]`` int32 candidate label ids per segment,
                   -1 padded (both unused candidate slots and segments past
                   ``n_segments[i]``).
      n_segments:  ``[N]`` int32 true segment counts.
    Returns per-video best label sequences (Python ints).
    """
    import jax
    import jax.numpy as jnp

    global _DECODE_JIT
    if _DECODE_JIT is None:
        _DECODE_JIT = jax.jit(_decode, static_argnames=("b", "bos", "eos"))
    n = candidates.shape[0]
    hist, best = _DECODE_JIT(
        jnp.asarray(table), jnp.asarray(candidates, jnp.int32),
        jnp.asarray(n_segments, jnp.int32),
        b=beam_size, bos=ids[BOS], eos=ids[EOS],
    )
    hist_np = np.asarray(hist)
    best_np = np.asarray(best)
    nseg_np = np.asarray(n_segments, dtype=np.int64)
    out = []
    for i in range(n):
        seq = hist_np[i, best_np[i], : nseg_np[i]]
        out.append([int(t) for t in seq])
    return out


def _decode(table_j, cand, nseg, *, b: int, bos: int, eos: int):
    """The whole decode as ONE jitted device program.

    Every eager jnp op in the old body was its own device dispatch, and the
    ~30 ms tunnel dispatch latency times ~10 setup/epilogue ops dominated
    the decode (the bench's "host-dispatch bound" 60-200 videos/s band).
    Module-level so the jit cache survives across calls; (N, S_max, K)
    shapes key it and one eval decodes a single shape."""
    import jax
    import jax.numpy as jnp

    n, s_max, k = cand.shape
    neg = jnp.float32(-1e30)
    cand_valid = cand >= 0
    cand_safe = jnp.where(cand_valid, cand, 0)

    # beam state: contexts [N, B, 2], cumulative no-eos scores [N, B],
    # chosen-token history [N, B, S] (ancestry is folded in by gathering the
    # parent's history at every step, so no separate backpointers)
    ctx0 = jnp.full((n, b, 2), bos, jnp.int32)
    score0 = jnp.where(jnp.arange(b) == 0, 0.0, neg)[None, :].repeat(n, 0)
    hist0 = jnp.full((n, b, s_max), -1, jnp.int32)

    def step(state, inp):
        ctx, score, hist = state
        seg_idx, c_tok, c_val = inp                        # [], [N,K], [N,K]
        active = seg_idx < nseg                            # [N]
        # expansion scores: cum + logP(tok | ctx)
        cond = table_j[ctx[:, :, 0], ctx[:, :, 1]]         # [N, B, V]
        tok_lp = jnp.take_along_axis(
            cond, c_tok[:, None, :].repeat(b, 1), axis=-1
        )                                                  # [N, B, K]
        cum = score[:, :, None] + tok_lp
        cum = jnp.where(c_val[:, None, :], cum, neg)
        # ranking key adds the </s> term of the NEW context (kenlm semantics)
        eos_lp = table_j[ctx[:, :, 1][:, :, None], c_tok[:, None, :], eos]
        rank = jnp.where(c_val[:, None, :], cum + eos_lp, neg)
        # stable top-k over beam-major flattened candidates = host tie order
        rank_flat = rank.reshape(n, b * k)
        _, top = jax.lax.top_k(rank_flat, b)               # [N, B]
        parent = top // k
        choice = top % k
        new_tok = jnp.take_along_axis(c_tok, choice, axis=1)  # [N, B]
        new_ctx = jnp.stack(
            [jnp.take_along_axis(ctx[:, :, 1], parent, 1), new_tok], axis=-1
        )
        new_score = jnp.take_along_axis(cum.reshape(n, b * k), top, 1)
        # histories follow the parent, then record the chosen token
        gather_hist = jnp.take_along_axis(hist, parent[:, :, None], 1)
        new_hist = gather_hist.at[:, :, seg_idx].set(new_tok)
        # inactive (padded) videos keep their state
        keep = active[:, None]
        ctx = jnp.where(keep[:, :, None], new_ctx, ctx)
        score = jnp.where(keep, new_score, score)
        hist = jnp.where(keep[:, :, None], new_hist, hist)
        return (ctx, score, hist), None

    xs = (
        jnp.arange(s_max),
        jnp.swapaxes(cand_safe, 0, 1),
        jnp.swapaxes(cand_valid, 0, 1),
    )
    (ctx, score, hist), _ = jax.lax.scan(step, (ctx0, score0, hist0), xs)
    # final ranking includes </s> exactly like lm.score(full prefix)
    final_eos = table_j[ctx[:, :, 0], ctx[:, :, 1], eos]
    best = jnp.argmax(score + final_eos, axis=1)           # [N]
    return hist, best


_DECODE_JIT = None  # lazily-built module-level jit (cache survives calls)


def pack_candidates(
    per_video_candidates: list[list[list[int]]], n_labels: int
) -> tuple[np.ndarray, np.ndarray]:
    """Ragged per-video per-segment candidate lists -> padded ``[N, S, K]``
    plus ``[N]`` segment counts (label ids are already table ids 0..47)."""
    n = len(per_video_candidates)
    s_max = max((len(v) for v in per_video_candidates), default=1) or 1
    k_max = max(
        (len(c) for v in per_video_candidates for c in v), default=1
    ) or 1
    cand = np.full((n, s_max, k_max), -1, np.int32)
    nseg = np.zeros((n,), np.int32)
    for i, vid in enumerate(per_video_candidates):
        nseg[i] = len(vid)
        for s, cs in enumerate(vid):
            cand[i, s, : len(cs)] = cs
    # ids must index the dense [V, V, V] trigram table built over n_labels
    if cand.max(initial=-1) >= n_labels or cand[cand != -1].min(initial=0) < 0:
        raise ValueError(
            f"candidate label id out of range [0, {n_labels}) for the dense "
            f"trigram table: max={cand.max()}"
        )
    return cand, nseg
