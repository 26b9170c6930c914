"""Vendored miniature transformer bi-encoder — the offline real-encoder
lane for the ST1 model seam (SURVEY §2.3 ST1; the reference's actual
scorer is a ``SentenceTransformer('all-MiniLM-L6-v2')``,
``category_mappings.py:77``).

``sentence_transformers`` has never been installable in this container, so
the encoder-registry "transformer" lane's parity pytest skipped every
round. This module closes that gap with a REAL transformer forward pass —
not a hash trick: seeded token + sinusoidal position embeddings,
multi-head scaled-dot-product self-attention with padding masks, GELU
feed-forward blocks, residual connections and layer norm, masked mean
pooling and L2 normalization — implemented in pure numpy with
deterministic (seeded) weights. It is the architecture of a sentence
encoder at toy scale (2 layers, 64 dim, 4 heads), so it exercises every
interface property the registry contract demands of a genuine model
(batched encode, normalized float32 output, determinism, semantic
sensitivity to token content and ORDER — a bag-of-ngrams hash cannot
distinguish permutations; this can) while needing nothing the container
lacks.

It is a FIXTURE: random weights mean untrained semantics, so linking
quality under it is measured and recorded (BASELINE.md "encoder lanes"),
not assumed. Swapping in the real MiniLM remains the one-line
``config.LINK_ENCODER = "transformer"`` change.
"""

from __future__ import annotations

import zlib

import numpy as np

MINI_DIM = 64
MINI_HEADS = 4
MINI_LAYERS = 2
MINI_VOCAB = 2048
MINI_MAX_LEN = 32
MINI_SEED = 40499


def _tokenize(s: str, max_len: int = MINI_MAX_LEN) -> list[int]:
    """Deterministic subword-ish ids: whitespace words, each word split to
    <=4-char pieces, crc32-hashed into the vocab (id 0 reserved for PAD,
    1 for CLS)."""
    ids = [1]
    for w in s.lower().split():
        for i in range(0, len(w), 4):
            piece = w[i:i + 4]
            ids.append(2 + (zlib.crc32(piece.encode("utf-8")) %
                            (MINI_VOCAB - 2)))
            if len(ids) >= max_len:
                return ids[:max_len]
    return ids[:max_len]


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return g * (x - mu) / np.sqrt(var + 1e-5) + b


def _gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


class MiniTransformerEncoder:
    """``(list[str]) -> L2-normalized float32 (n, 64)`` — the registry
    interface. Weights are built ONCE per instance from the fixed seed;
    the registry caches a module-level singleton so actor-side calls pay
    construction once per process (the broadcast-state cost model)."""

    def __init__(self, dim: int = MINI_DIM, n_heads: int = MINI_HEADS,
                 n_layers: int = MINI_LAYERS, seed: int = MINI_SEED):
        rng = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(dim)
        self.dim, self.n_heads = dim, n_heads
        self.tok_emb = rng.normal(0, s, (MINI_VOCAB, dim)) \
            .astype(np.float32)
        pos = np.arange(MINI_MAX_LEN)[:, None]
        i = np.arange(dim // 2)[None, :]
        ang = pos / (10000.0 ** (2 * i / dim))
        pe = np.zeros((MINI_MAX_LEN, dim), np.float32)
        pe[:, 0::2] = np.sin(ang)
        pe[:, 1::2] = np.cos(ang)
        self.pos_emb = pe
        self.layers = []
        for _ in range(n_layers):
            lay = {k: rng.normal(0, s, (dim, dim)).astype(np.float32)
                   for k in ("wq", "wk", "wv", "wo")}
            lay["w1"] = rng.normal(0, s, (dim, 4 * dim)).astype(np.float32)
            lay["w2"] = rng.normal(0, s, (4 * dim, dim)).astype(np.float32)
            for k in ("g1", "g2"):
                lay[k] = np.ones(dim, np.float32)
            for k in ("b1", "b2"):
                lay[k] = np.zeros(dim, np.float32)
            self.layers.append(lay)
        # Post-hoc whitening (Su et al. 2021, "Whitening Sentence
        # Representations"): an UNTRAINED transformer's pooled outputs are
        # strongly anisotropic — every sentence shares a large common
        # component, so raw cosines crowd toward 1 and thresholding is
        # meaningless. Subtracting the mean embedding of a fixed seeded
        # probe set restores spread deterministically; identical strings
        # still map to identical vectors.
        probe_rng = np.random.RandomState(seed + 1)
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        probes = [" ".join("".join(probe_rng.choice(letters,
                                                    probe_rng.randint(2, 9)))
                           for _ in range(probe_rng.randint(1, 4)))
                  for _ in range(128)]
        self.mu = np.zeros(dim, np.float32)
        self.mu = self._forward(probes).mean(axis=0)

    def _forward(self, strings) -> np.ndarray:
        strings = list(strings)
        n = len(strings)
        if n == 0:
            return np.zeros((0, self.dim), np.float32)
        toks = [_tokenize(s) for s in strings]
        L = max(len(t) for t in toks)
        ids = np.zeros((n, L), np.int64)
        mask = np.zeros((n, L), bool)
        for r, t in enumerate(toks):
            ids[r, :len(t)] = t
            mask[r, :len(t)] = True
        x = self.tok_emb[ids] + self.pos_emb[:L]
        neg = np.float32(-1e9)
        h, dk = self.n_heads, self.dim // self.n_heads
        for lay in self.layers:
            q = (x @ lay["wq"]).reshape(n, L, h, dk).transpose(0, 2, 1, 3)
            k = (x @ lay["wk"]).reshape(n, L, h, dk).transpose(0, 2, 1, 3)
            v = (x @ lay["wv"]).reshape(n, L, h, dk).transpose(0, 2, 1, 3)
            att = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(
                np.float32(dk))
            att = np.where(mask[:, None, None, :], att, neg)
            att = att - att.max(axis=-1, keepdims=True)
            e = np.exp(att)
            att = e / e.sum(axis=-1, keepdims=True)
            o = (att @ v).transpose(0, 2, 1, 3).reshape(n, L, self.dim)
            x = _layer_norm(x + o @ lay["wo"], lay["g1"], lay["b1"])
            x = _layer_norm(x + _gelu(x @ lay["w1"]) @ lay["w2"],
                            lay["g2"], lay["b2"])
        x = np.where(mask[:, :, None], x, 0.0)
        pooled = x.sum(axis=1) / np.maximum(
            mask.sum(axis=1, keepdims=True), 1)
        return pooled.astype(np.float32) - self.mu

    def __call__(self, strings, dim: int | None = None) -> np.ndarray:
        pooled = self._forward(strings)
        norms = np.linalg.norm(pooled, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (pooled / norms).astype(np.float32)


_SINGLETON: MiniTransformerEncoder | None = None


def mini_encoder() -> MiniTransformerEncoder:
    global _SINGLETON
    if _SINGLETON is None:
        _SINGLETON = MiniTransformerEncoder()
    return _SINGLETON
