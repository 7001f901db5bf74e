"""Seq2seq grapheme→phoneme model — the framework dogfooding itself
(round-2 verdict item 5).

A character-level LAS with the audio front-end replaced by a character
embedding: char embed → 1-layer BiLSTM listener (no pyramid — words are
short) → the standard attention speller over IPA phone tokens. Reuses
``models/listener.py``, ``models/speller.py`` and ``decode/`` unchanged,
so the G2P model exercises exactly the production encoder/decoder stack.

Trained on the bundled expanded lexicon (``data/lexicon_en.py``,
~2.2k word/pron pairs); gated on the held-out gold set at PER ≤ 0.05
(vs the ≤ 0.15 rule-table gate it replaces). At inference the trained
model handles plain alphabetic words and the rule tables remain the
fallback for anything else (digits, OOV characters).

No reference equivalent: the reference shells out to an external
phonemizer (SURVEY.md §2 Common Voice row).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.models.listener import (
    ListenerConfig,
    ListenerParams,
    init_listener,
    listen,
)
from phones_las_tpu.models.speller import (
    SpellerConfig,
    SpellerParams,
    init_speller,
    teacher_forced_decode,
)

G2P_CHARS = list("abcdefghijklmnopqrstuvwxyz'-")


def char_vocab() -> Vocab:
    return Vocab(G2P_CHARS)


@dataclasses.dataclass(frozen=True)
class G2PConfig:
    char_vocab_size: int
    phone_vocab_size: int
    char_embed_dim: int = 64
    units: int = 128
    bos_id: int = Vocab.sos_id
    eos_id: int = Vocab.eos_id

    @property
    def listener(self) -> ListenerConfig:
        # one layer, no pyramid: every character position stays addressable
        return ListenerConfig(
            input_dim=self.char_embed_dim, num_layers=1, units=self.units
        )

    @property
    def speller(self) -> SpellerConfig:
        return SpellerConfig(
            vocab_size=self.phone_vocab_size,
            embedding_dim=self.char_embed_dim,
            num_layers=1,
            units=self.units,
            memory_dim=2 * self.units,
            attention_type="bahdanau",
            attention_units=self.units,
            attention_layer_size=self.units,
            bos_id=self.bos_id,
            eos_id=self.eos_id,
        )


class G2PParams(NamedTuple):
    char_embed: jnp.ndarray  # [C, E]
    listener: ListenerParams
    speller: SpellerParams


def init_g2p(key, cfg: G2PConfig) -> G2PParams:
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 1.0 / np.sqrt(cfg.char_embed_dim)
    return G2PParams(
        char_embed=jax.random.normal(
            k1, (cfg.char_vocab_size, cfg.char_embed_dim)) * scale,
        listener=init_listener(k2, cfg.listener),
        speller=init_speller(k3, cfg.speller),
    )


def encode_chars(params: G2PParams, cfg: G2PConfig,
                 chars: jnp.ndarray, lengths: jnp.ndarray):
    """[B, S] char ids → (memory [B, S, 2U], enc_mask [B, S])."""
    emb = params.char_embed[chars]
    memory, lens = listen(params.listener, cfg.listener, emb, lengths)
    mask = jnp.arange(memory.shape[1])[None, :] < lens[:, None]
    return memory, mask


def g2p_loss(params: G2PParams, cfg: G2PConfig, batch: Dict[str, jnp.ndarray],
             label_smoothing: float = 0.0):
    """Masked CE over teacher-forced phone logits (+ uniform smoothing —
    a 2.2k-pair lexicon memorizes in hundreds of steps, so the gate is
    generalization, not fit)."""
    memory, mask = encode_chars(params, cfg, batch["chars"], batch["char_lengths"])
    targets, tlens = batch["phones"], batch["phone_lengths"]  # [B, L], [B]
    b, l = targets.shape
    sos = jnp.full((b, 1), cfg.bos_id, targets.dtype)
    dec_in = jnp.concatenate([sos, targets[:, :-1]], axis=1)
    logits, _, _ = teacher_forced_decode(
        params.speller, cfg.speller, dec_in, memory, mask
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        nll = (1.0 - label_smoothing) * nll - label_smoothing * logp.mean(-1)
    tmask = jnp.arange(l)[None, :] < tlens[:, None]  # includes the <eos> slot
    return (nll * tmask).sum() / jnp.maximum(tmask.sum(), 1)


def _pad_batch(vocab_c: Vocab, vocab_p: Vocab,
               items: Sequence[Tuple[str, Tuple[str, ...]]],
               max_word: int, max_pron: int) -> Dict[str, np.ndarray]:
    b = len(items)
    chars = np.zeros((b, max_word), np.int32)
    clens = np.zeros(b, np.int32)
    phones = np.full((b, max_pron), vocab_p.eos_id, np.int32)
    plens = np.zeros(b, np.int32)
    for i, (word, pron) in enumerate(items):
        c = vocab_c.encode(list(word))[:max_word]
        chars[i, : len(c)] = c
        clens[i] = len(c)
        p = vocab_p.encode(list(pron))[:max_pron - 1]
        phones[i, : len(p)] = p
        plens[i] = len(p) + 1  # learn the <eos> too
    return {"chars": chars, "char_lengths": clens,
            "phones": phones, "phone_lengths": plens}


def _eval_per(params, cfg, vocab_c, vocab_p, dev_items) -> float:
    from phones_las_tpu.train.metrics import _edit_distance

    hyps = predict(params, cfg, vocab_c, vocab_p,
                   [w for w, _ in dev_items], beam_width=1)
    dist = total = 0
    for (w, ref), hyp in zip(dev_items, hyps):
        dist += _edit_distance(vocab_p.encode(hyp), vocab_p.encode(ref))
        total += len(ref)
    return dist / max(total, 1)


def train_g2p(
    lexicon: Dict[str, Tuple[str, ...]],
    *,
    steps: int = 1500,
    batch_size: int = 256,
    learning_rate: float = 2e-3,
    label_smoothing: float = 0.1,
    units: int = 128,
    dev_fraction: float = 0.05,
    eval_every: int = 150,
    seed: int = 0,
    log_every: int = 0,
) -> Tuple[G2PParams, G2PConfig, Vocab, Vocab]:
    """Train on a word→pronunciation dict; returns params + vocabs.

    ``dev_fraction`` of the lexicon is held out; the returned params are
    the best-dev-PER checkpoint (early stopping — the lexicon memorizes
    in a few hundred steps, after which generalization degrades)."""
    import optax

    vocab_c = char_vocab()
    vocab_p = Vocab(sorted({p for pron in lexicon.values() for p in pron}))
    items = sorted(lexicon.items())
    rng = np.random.RandomState(seed)
    if dev_fraction > 0.0:
        perm = rng.permutation(len(items))
        n_dev = max(int(len(items) * dev_fraction), 1)
        dev_items = [items[i] for i in perm[:n_dev]]
        items = [items[i] for i in perm[n_dev:]]
    else:
        dev_items = []
    max_word = max(len(w) for w, _ in items)
    max_pron = max(len(p) for _, p in items) + 1  # +<eos>

    cfg = G2PConfig(char_vocab_size=len(vocab_c), phone_vocab_size=len(vocab_p),
                    units=units)
    params = init_g2p(jax.random.PRNGKey(seed), cfg)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(learning_rate))
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch):
        loss, grads = jax.value_and_grad(g2p_loss)(
            params, cfg, batch, label_smoothing)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(items)
    best = (float("inf"), params)
    loss = None
    for s in range(steps):
        idx = rng.randint(0, n, batch_size)
        batch = _pad_batch(vocab_c, vocab_p, [items[i] for i in idx],
                           max_word, max_pron)
        params, opt_state, loss = step_fn(
            params, opt_state, {k: jnp.asarray(v) for k, v in batch.items()}
        )
        if dev_items and (s + 1) % eval_every == 0:
            per = _eval_per(params, cfg, vocab_c, vocab_p, dev_items)
            if per < best[0]:
                best = (per, jax.tree.map(np.asarray, params))
            if log_every:
                print(f"g2p step {s + 1}: loss {float(loss):.4f} "
                      f"dev_per {per:.4f} best {best[0]:.4f}")
        elif log_every and (s + 1) % log_every == 0:
            print(f"g2p step {s + 1}: loss {float(loss):.4f}")
    if dev_items and best[0] < float("inf"):
        params = jax.tree.map(jnp.asarray, best[1])
    return params, cfg, vocab_c, vocab_p


def predict(
    params: G2PParams, cfg: G2PConfig, vocab_c: Vocab, vocab_p: Vocab,
    words: Sequence[str], *, beam_width: int = 4, max_steps: int = 24,
    pad_words_to: Optional[int] = None, length_penalty: float = 0.0,
) -> List[List[str]]:
    """Batch words → IPA token lists (beam search; greedy if width ≤ 1).
    ``pad_words_to`` fixes the char axis so repeated calls share one
    compiled program."""
    from phones_las_tpu.decode import beam_decode, greedy_decode

    b = len(words)
    max_word = pad_words_to or max(max(len(w) for w in words), 2)
    chars = np.zeros((b, max_word), np.int32)
    clens = np.zeros(b, np.int32)
    for i, w in enumerate(words):
        c = vocab_c.encode(list(w))[:max_word]
        chars[i, : len(c)] = c
        clens[i] = len(c)
    memory, mask = encode_chars(
        params, cfg, jnp.asarray(chars), jnp.asarray(clens)
    )
    if beam_width > 1:
        res = beam_decode(params.speller, cfg.speller, memory, mask,
                          max_steps=max_steps, beam_width=beam_width,
                          length_penalty=length_penalty)
        tokens, lengths = np.asarray(res.tokens), np.asarray(res.lengths)
    else:
        t, l, _ = greedy_decode(params.speller, cfg.speller, memory, mask,
                                max_steps)
        tokens, lengths = np.asarray(t), np.asarray(l)
    return [vocab_p.decode(tokens[i, : lengths[i]]) for i in range(b)]


class NeuralG2P:
    """Trained-model front for ``data.g2p.text_to_ipa``: handles plain
    alphabetic words in fixed-shape cached batches; anything with
    characters outside the model's vocabulary falls back to the rule
    tables (the caller decides). One compiled program serves every call
    (fixed word/batch padding)."""

    _PAD_WORD = 28
    _PAD_BATCH = 64

    def __init__(self, path: str, *, beam_width: int = 4):
        self.params, self.cfg, self.vocab_c, self.vocab_p = load_g2p(path)
        self.beam_width = beam_width
        self._cache: Dict[str, List[str]] = {}
        self._alpha = set(G2P_CHARS)

    @classmethod
    def bundled(cls, **kw) -> "NeuralG2P":
        """The shipped EN model (assets/g2p_en.npz: trained on the
        expanded lexicon with dev early stopping; gold-set PER 0.048 vs
        the rule tables' ~0.06 — tests/test_g2p_coverage.py gates it
        at ≤ 0.05)."""
        import os

        return cls(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "assets", "g2p_en.npz"), **kw)

    def handles(self, word: str) -> bool:
        return bool(word) and len(word) <= self._PAD_WORD and all(
            c in self._alpha for c in word
        )

    def lookup(self, words: Sequence[str]) -> Dict[str, List[str]]:
        """Transcribe (with caching) the subset of ``words`` the model
        handles; returns word → IPA tokens."""
        todo = sorted({w for w in words if self.handles(w)} - set(self._cache))
        for i in range(0, len(todo), self._PAD_BATCH):
            chunk = todo[i : i + self._PAD_BATCH]
            padded = chunk + ["a"] * (self._PAD_BATCH - len(chunk))
            outs = predict(
                self.params, self.cfg, self.vocab_c, self.vocab_p, padded,
                beam_width=self.beam_width, pad_words_to=self._PAD_WORD,
            )
            for w, o in zip(chunk, outs):
                self._cache[w] = o
        return {w: self._cache[w] for w in words if w in self._cache}


# ---------------------------------------------------------------------------
# npz serialization (tiny model — one file, no orbax)
# ---------------------------------------------------------------------------


def save_g2p(path: str, params: G2PParams, cfg: G2PConfig,
             vocab_c: Vocab, vocab_p: Vocab) -> None:
    flat = {f"p{i}": np.asarray(x)
            for i, x in enumerate(jax.tree.leaves(params))}
    np.savez(
        path,
        chars="\n".join(vocab_c.tokens),
        phones="\n".join(vocab_p.tokens),
        char_embed_dim=cfg.char_embed_dim,
        units=cfg.units,
        **flat,
    )


def load_g2p(path: str) -> Tuple[G2PParams, G2PConfig, Vocab, Vocab]:
    z = np.load(path, allow_pickle=False)
    vocab_c = Vocab(str(z["chars"]).split("\n")[4:])  # specials re-added
    vocab_p = Vocab(str(z["phones"]).split("\n")[4:])
    cfg = G2PConfig(
        char_vocab_size=len(vocab_c), phone_vocab_size=len(vocab_p),
        char_embed_dim=int(z["char_embed_dim"]), units=int(z["units"]),
    )
    template = jax.eval_shape(
        lambda: init_g2p(jax.random.PRNGKey(0), cfg)
    )
    leaves = [jnp.asarray(z[f"p{i}"])
              for i in range(len(jax.tree.leaves(template)))]
    return (jax.tree.unflatten(jax.tree.structure(template), leaves),
            cfg, vocab_c, vocab_p)
