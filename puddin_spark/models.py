"""Model-based scoring UDFs: language-ID and n-gram perplexity.

North-star surface: "fastText language-ID and KenLM-style n-gram perplexity
scoring run as vectorized pandas/Arrow UDFs". Neither fastText nor KenLM is
installed in this container, so this module implements the same *shape* with
self-contained models:

- LangIdModel: Cavnar-Trenkle-style character-trigram profile classifier
  (the classic pre-fastText technique) with small embedded profiles for
  en/de/fr/es. `swap_model()` accepts any object with
  `predict(texts) -> (labels, scores)` — drop fastText in on a real cluster.
- CharLMModel: character n-gram language model with stupid backoff
  (KenLM's scheme), trainable on any corpus, serializable to JSON, scoring
  per-document perplexity.

Execution pattern (reference analog: Stanza loaded once per process,
parse_pile.py:114-126): ITERATOR pandas UDFs with a per-executor-process
lazily initialized singleton — the model loads once per Python worker, then
streams Arrow batches.
"""
from __future__ import annotations

import json
import math
from collections import Counter
from collections.abc import Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- embedded training snippets (written for this project; one per lang) ---

_SEED_TEXT = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then the old man "
        "walked to the market where he bought bread and cheese for the "
        "children who were waiting at home with their mother and the dog "
        "it was a bright cold day in april and the clocks were striking "
        "thirteen while people hurried along the street to their offices"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und dann "
        "ging der alte mann zum markt wo er brot und kaese fuer die kinder "
        "kaufte die zu hause mit ihrer mutter und dem hund warteten es war "
        "ein heller kalter tag im april und die uhren schlugen dreizehn "
        "waehrend die leute die strasse entlang zu ihren bueros eilten"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et puis "
        "le vieil homme est alle au marche ou il a achete du pain et du "
        "fromage pour les enfants qui attendaient a la maison avec leur "
        "mere et le chien c etait une journee froide et lumineuse d avril "
        "et les horloges sonnaient treize heures pendant que les gens se "
        "depechaient dans la rue vers leurs bureaux"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y luego el "
        "viejo hombre fue al mercado donde compro pan y queso para los "
        "ninos que esperaban en casa con su madre y el perro era un dia "
        "frio y luminoso de abril y los relojes daban las trece mientras "
        "la gente se apresuraba por la calle hacia sus oficinas"
    ),
}


def _trigrams(text: str) -> Counter:
    t = " " + " ".join(text.lower().split()) + " "
    return Counter(t[i : i + 3] for i in range(len(t) - 2))


class LangIdModel:
    """Character-trigram cosine-profile classifier."""

    def __init__(self, profiles: dict[str, dict[str, float]] | None = None):
        if profiles is None:
            profiles = {}
            for lang, seed in _SEED_TEXT.items():
                c = _trigrams(seed)
                norm = math.sqrt(sum(v * v for v in c.values()))
                profiles[lang] = {g: v / norm for g, v in c.items()}
        self.profiles = profiles

    def predict_one(self, text: str) -> tuple[str, float]:
        c = _trigrams(text[:4000])
        if not c:
            return "und", 0.0
        norm = math.sqrt(sum(v * v for v in c.values()))
        best_lang, best = "und", 0.0
        for lang, prof in self.profiles.items():
            dot = sum(v * prof.get(g, 0.0) for g, v in c.items())
            score = dot / norm
            if score > best:
                best_lang, best = lang, score
        return best_lang, round(best, 6)

    def predict(self, texts) -> tuple[list[str], list[float]]:
        pairs = [self.predict_one(t or "") for t in texts]
        return [p[0] for p in pairs], [p[1] for p in pairs]


class CharLMModel:
    """Char n-gram LM with stupid backoff (alpha=0.4), KenLM-style scoring.

    perplexity(text) = exp(-avg log p(c | history)). Lower = more like the
    training corpus; gate with a threshold to drop gibberish.
    """

    ALPHA = 0.4

    def __init__(self, n: int = 3, counts: list[dict[str, int]] | None = None):
        self.n = n
        # counts[k] = k+1-gram counts
        self.counts: list[dict[str, int]] = counts or [dict() for _ in range(n)]

    @staticmethod
    def _norm(text: str) -> str:
        return " " + " ".join(text.lower().split()) + " "

    def train(self, corpus) -> "CharLMModel":
        for doc in corpus:
            t = self._norm(doc)
            for k in range(1, self.n + 1):
                d = self.counts[k - 1]
                for i in range(len(t) - k + 1):
                    g = t[i : i + k]
                    d[g] = d.get(g, 0) + 1
        return self

    def _logp(self, hist: str, ch: str) -> float:
        # stupid backoff: score(c|h) = count(hc)/count(h) else alpha*score(c|h[1:])
        for back in range(len(hist) + 1):
            h = hist[back:]
            num = self.counts[len(h)].get(h + ch, 0)
            den = (
                self.counts[len(h) - 1].get(h, 0)
                if h
                else sum(self.counts[0].values())
            )
            if num > 0 and den > 0:
                return math.log(num / den) + back * math.log(self.ALPHA)
        return math.log(1e-7)

    def perplexity(self, text: str) -> float:
        t = self._norm(text)[:4000]
        if len(t) < self.n:
            return float("inf")
        lp = 0.0
        cnt = 0
        for i in range(self.n - 1, len(t)):
            lp += self._logp(t[i - self.n + 1 : i], t[i])
            cnt += 1
        return round(math.exp(-lp / max(cnt, 1)), 4)

    # --- serialization (ship to executors as a file / broadcast) ---

    def to_json(self) -> str:
        return json.dumps({"n": self.n, "counts": self.counts})

    @classmethod
    def from_json(cls, s: str) -> "CharLMModel":
        d = json.loads(s)
        return cls(n=d["n"], counts=d["counts"])

    def save(self, path: str | Path) -> None:
        Path(path).write_text(self.to_json())

    @classmethod
    def load(cls, path: str | Path) -> "CharLMModel":
        return cls.from_json(Path(path).read_text())


# --- per-executor singletons (the heavy-model pattern) ---

_LANGID_SINGLETON: LangIdModel | None = None
_CHARLM_SINGLETON: dict[str, CharLMModel] = {}


def _get_langid() -> LangIdModel:
    global _LANGID_SINGLETON
    if _LANGID_SINGLETON is None:
        _LANGID_SINGLETON = LangIdModel()
    return _LANGID_SINGLETON


def _get_charlm(model_path: str) -> CharLMModel:
    if model_path not in _CHARLM_SINGLETON:
        if model_path == "__builtin_en__":
            _CHARLM_SINGLETON[model_path] = CharLMModel(3).train(
                [_SEED_TEXT["en"]]
            )
        else:
            _CHARLM_SINGLETON[model_path] = CharLMModel.load(model_path)
    return _CHARLM_SINGLETON[model_path]


LANGID_SCHEMA = T.StructType(
    [
        T.StructField("pred_lang", T.StringType()),
        T.StructField("lang_score", T.DoubleType()),
    ]
)


@F.pandas_udf(LANGID_SCHEMA)
def langid_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    model = _get_langid()  # once per Python worker process
    for texts in it:
        langs, scores = model.predict(texts)
        yield pd.DataFrame({"pred_lang": langs, "lang_score": scores})


def perplexity_udf(model_path: str = "__builtin_en__"):
    """Factory: iterator pandas UDF scoring perplexity against the model at
    model_path (executor-local file or the builtin seed model)."""

    @F.pandas_udf(T.DoubleType())
    def _ppl(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = _get_charlm(model_path)
        for texts in it:
            yield texts.map(lambda t: model.perplexity(t) if t else float("inf"))

    return _ppl


def swap_langid_model(model) -> None:
    """Install a different langid model (e.g. real fastText) process-wide."""
    global _LANGID_SINGLETON
    _LANGID_SINGLETON = model


# --- document embeddings (stand-in for a sentence-encoder model) ---

EMBEDDING_DIM = 64


class DocEmbeddingModel:
    """Deterministic signed feature-hashing document embedder — the
    stand-in occupying the sentence-transformer seam (swap_embedding_model
    installs a real encoder; any object with `encode(texts) -> list of
    list[float]` fits).

    Each token hashes (md5, engine-independent) to one of `dim` bins with a
    +/-1 sign; the doc vector is the L2-normalized signed bag-of-words.
    Signed hashing centers random-doc cosines near 0 (unsigned counts
    would push all-positive vectors toward cos ~0.6), while a near-copy
    keeps cosine ~1 — exactly the contrast embedding near-dedup needs.
    Token hash results are memoized per worker process."""

    def __init__(self, dim: int = EMBEDDING_DIM):
        self.dim = dim
        self._cache: dict[str, tuple[int, int]] = {}

    def _slot(self, tok: str) -> tuple[int, int]:
        hit = self._cache.get(tok)
        if hit is None:
            import hashlib

            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            hit = (h % self.dim, 1 if (h // self.dim) % 2 == 0 else -1)
            self._cache[tok] = hit
        return hit

    def encode_one(self, text: str) -> list[float]:
        vec = [0.0] * self.dim
        for tok in (text or "").split():
            b, s = self._slot(tok)
            vec[b] += s
        norm = math.sqrt(sum(x * x for x in vec))
        if norm == 0.0:
            return vec
        return [x / norm for x in vec]

    def encode(self, texts) -> list[list[float]]:
        return [self.encode_one(t) for t in texts]


_EMBEDDING_SINGLETON: DocEmbeddingModel | None = None


def _get_embedder() -> DocEmbeddingModel:
    global _EMBEDDING_SINGLETON
    if _EMBEDDING_SINGLETON is None:
        _EMBEDDING_SINGLETON = DocEmbeddingModel()
    return _EMBEDDING_SINGLETON


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def doc_embedding_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    model = _get_embedder()  # once per Python worker process
    for texts in it:
        yield pd.Series(model.encode(texts.fillna("").tolist()))


def swap_embedding_model(model) -> None:
    """Install a different document encoder process-wide (driver-local; for
    executors, pass a factory through the UDF closure as in
    annotate.make_annotate_safe_udf)."""
    global _EMBEDDING_SINGLETON
    _EMBEDDING_SINGLETON = model
