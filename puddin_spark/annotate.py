"""Pluggable UD-annotation stage: fills the 10-column CoNLL-U surface.

The reference's entire output format is dependency-parsed CoNLL-U from
Stanza (parse_pile.py:114-126 loads the pipeline once per process;
:1443,:1455 run tokenize+pos+lemma+depparse). Stanza is not in this
container, so this module ships the same *execution shape* with a
deterministic stand-in:

- RuleAnnotator: suffix-rule UPOS tagger + suffix-strip lemmatizer + a
  first-verb-root head heuristic. Every decision is a pure function of the
  token sequence, so a SQL oracle can replay it bit-for-bit (gate
  `conllu_annotated`).
- Execution pattern (mirrors models.py): an ITERATOR pandas UDF with a
  per-executor-process singleton and a `swap_annotator()` seam — drop a real
  Stanza/UDPipe wrapper in on a cluster that has one. The UDF consumes a
  pre-tokenized array column (rules.tokenize for pipeline text, whitespace
  split for the oracle-paired gate) and returns one struct per token, so
  annotation stays relational until the conllu sink renders lines.

UPOS inventory used: PUNCT NUM DET PRON ADP CCONJ AUX ADV VERB ADJ NOUN.
Head scheme: root = first VERB; else, when an AUX is followed by a content
predicate (NOUN/ADJ/PRON/NUM), the PREDICATE is the root and that AUX
attaches to it as `cop` (the UD copula analysis: in "she is happy" the
root is "happy", not "is"); else the first AUX; else the first non-PUNCT
token; else token 1. DET/ADJ/NUM/ADP attach to the NEXT NOUN (the UD det/
amod/nummod/case shape, falling back to the root when no noun follows).
Coordination: a CCONJ attaches FORWARD to the next content token (UD's
cc-to-following-conjunct), and a NOUN immediately after a CCONJ attaches
BACK to the previous NOUN as `conj` (first-conjunct-heads shape for
"cats and dogs"). Every other non-root token attaches to the root.
Deprels come from UPOS (det/case/cc/aux/cop/advmod/amod/nsubj/nummod/
punct/obl/conj). Deliberately simple — the point is a real, testable
10-column shape with a working swap seam, not parser accuracy. All heads
are acyclic by construction: nominal attachers are never NOUN, conj-NOUNs
attach strictly backward, CCONJ is never anyone's head, and the copular
AUX attaches to the root.
"""
from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# closed-class lexicons (kept tiny and FROZEN: the DuckDB oracle embeds the
# same lists — see queries._oracle_annotate; change both together)
DET_WORDS = ("the", "a", "an", "this", "that", "these", "those")
PRON_WORDS = ("i", "you", "he", "she", "it", "we", "they", "me", "him",
              "her", "us", "them", "who", "what")
ADP_WORDS = ("of", "in", "on", "at", "by", "for", "with", "from", "to",
             "into", "over", "under", "about")
CCONJ_WORDS = ("and", "or", "but", "nor", "yet", "so")
AUX_WORDS = ("is", "are", "was", "were", "be", "been", "being", "am",
             "has", "have", "had", "do", "does", "did", "will", "would",
             "can", "could", "shall", "should", "may", "might", "must")

DEPREL_BY_UPOS = {
    "PUNCT": "punct", "DET": "det", "ADP": "case", "CCONJ": "cc",
    "AUX": "aux", "ADV": "advmod", "ADJ": "amod", "PRON": "nsubj",
    "NUM": "nummod", "NOUN": "obl", "VERB": "conj",
}

_PUNCT_RE = re.compile(r"^[^A-Za-z0-9]+$")
_NUM_RE = re.compile(r"^[0-9]+([.,][0-9]+)*$")


class RuleAnnotator:
    """Deterministic rule-based UD stand-in (see module docstring). The swap
    contract is `annotate(tokens) -> list of (ix, form, lemma, upos, head,
    deprel)` with ix/head 1-based (head 0 = root), which a Stanza wrapper
    satisfies trivially."""

    def upos(self, form: str) -> str:
        if _PUNCT_RE.match(form):
            return "PUNCT"
        if _NUM_RE.match(form):
            return "NUM"
        low = form.lower()
        if low in DET_WORDS:
            return "DET"
        if low in PRON_WORDS:
            return "PRON"
        if low in ADP_WORDS:
            return "ADP"
        if low in CCONJ_WORDS:
            return "CCONJ"
        if low in AUX_WORDS:
            return "AUX"
        if len(low) > 3 and low.endswith("ly"):
            return "ADV"
        if len(low) > 4 and (low.endswith("ing") or low.endswith("ed")):
            return "VERB"
        if len(low) > 4 and low.endswith(("ous", "ful", "ive", "able", "al")):
            return "ADJ"
        return "NOUN"

    def lemma(self, form: str, upos: str) -> str:
        low = form.lower()
        if upos == "VERB" and low.endswith("ing"):
            return low[:-3]
        if upos == "VERB" and low.endswith("ed"):
            return low[:-2]
        if upos == "NOUN" and len(low) > 3 and low.endswith("s") and not low.endswith("ss"):
            return low[:-1]
        return low

    _CONTENT = ("NOUN", "ADJ", "PRON", "NUM", "VERB")
    _PREDICATE = ("NOUN", "ADJ", "PRON", "NUM")

    def annotate(self, tokens: list[str]) -> list[tuple]:
        tagged = [(form, self.upos(form)) for form in tokens]
        n = len(tagged)
        # root: first VERB; else copular predicate (first NOUN/ADJ/PRON/NUM
        # strictly after the first AUX — that AUX becomes `cop`); else the
        # first AUX; else first non-PUNCT; else 1 (module docstring)
        verb_ix = next((i + 1 for i, (_, u) in enumerate(tagged) if u == "VERB"), 0)
        aux_ix = next((i + 1 for i, (_, u) in enumerate(tagged) if u == "AUX"), 0)
        cop_ix = 0
        if verb_ix:
            root_ix = verb_ix
        elif aux_ix:
            pred_ix = next(
                (
                    i + 1
                    for i, (_, u) in enumerate(tagged)
                    if i + 1 > aux_ix and u in self._PREDICATE
                ),
                0,
            )
            root_ix = pred_ix or aux_ix
            cop_ix = aux_ix if pred_ix else 0
        else:
            root_ix = next(
                (i + 1 for i, (_, u) in enumerate(tagged) if u != "PUNCT"), 1
            )
        # nominal attachment: next_noun[ix] = the first NOUN strictly after
        # ix (0 if none) — DET/ADJ/NUM attach to the noun they modify and
        # ADP to the noun it case-marks. Coordination: next_content[ix]
        # gives a CCONJ its following conjunct; prev_noun[ix] (last NOUN
        # strictly before ix) gives a NOUN-right-after-a-CCONJ its first
        # conjunct. Everything else attaches to the root. Acyclicity: see
        # the module docstring.
        next_noun = [0] * (n + 1)
        next_content = [0] * (n + 1)
        nn = nc = 0
        for i in range(n, 0, -1):
            next_noun[i] = nn
            next_content[i] = nc
            if tagged[i - 1][1] == "NOUN":
                nn = i
            if tagged[i - 1][1] in self._CONTENT:
                nc = i
        prev_noun = [0] * (n + 1)
        pn = 0
        for i in range(1, n + 1):
            prev_noun[i] = pn
            if tagged[i - 1][1] == "NOUN":
                pn = i
        out = []
        for i, (form, upos) in enumerate(tagged):
            ix = i + 1
            if ix == root_ix:
                head, deprel = 0, "root"
            elif ix == cop_ix:
                head, deprel = root_ix, "cop"
            elif upos == "CCONJ":
                head, deprel = next_content[ix] or root_ix, "cc"
            elif (
                upos == "NOUN"
                and ix >= 2
                and tagged[i - 1][1] == "CCONJ"
                and prev_noun[ix]
            ):
                head, deprel = prev_noun[ix], "conj"
            elif upos in ("DET", "ADJ", "NUM", "ADP") and next_noun[ix]:
                head, deprel = next_noun[ix], DEPREL_BY_UPOS[upos]
            else:
                head, deprel = root_ix, DEPREL_BY_UPOS[upos]
            out.append((ix, form, self.lemma(form, upos), upos, head, deprel))
        return out


# --- per-executor singleton + swap seam (the heavy-model pattern) ---

_ANNOTATOR: RuleAnnotator | None = None


def get_annotator():
    global _ANNOTATOR
    if _ANNOTATOR is None:
        _ANNOTATOR = RuleAnnotator()
    return _ANNOTATOR


def swap_annotator(model) -> None:
    """Install a different annotator (e.g. a real Stanza wrapper)
    process-wide; any object with `annotate(tokens) -> rows` works."""
    global _ANNOTATOR
    _ANNOTATOR = model


TOKEN_ANNO_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("ix", T.IntegerType()),
            T.StructField("form", T.StringType()),
            T.StructField("lemma", T.StringType()),
            T.StructField("upos", T.StringType()),
            T.StructField("head", T.IntegerType()),
            T.StructField("deprel", T.StringType()),
        ]
    )
)


@F.pandas_udf(TOKEN_ANNO_SCHEMA)
def annotate_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """tokens array -> annotation structs; iterator form so the annotator
    loads once per Python worker (the Stanza-singleton execution pattern,
    parse_pile.py:114-126), then streams Arrow batches."""
    model = get_annotator()
    for token_lists in it:
        yield token_lists.map(
            lambda toks: model.annotate(list(toks)) if toks is not None else []
        )


SAFE_ANNO_SCHEMA = T.StructType(
    [
        T.StructField("anno", TOKEN_ANNO_SCHEMA),
        T.StructField("error", T.StringType()),
    ]
)


def make_annotate_safe_udf(factory=None):
    """Failure-catching variant of annotate_udf: returns struct(anno, error)
    per sentence, error null on success. This is the F9 `fail` analog — the
    reference caught Stanza RuntimeErrors per document and recorded the doc
    as excluded post-hoc (parse_pile.py:1443-1447,1374-1390); here the catch
    is per sentence and pipeline.conllu_with_failures lifts it to doc level.

    `factory` (optional, cloudpickled with the UDF closure) builds the
    annotator; default is the process-singleton get_annotator(). It is
    called once per TASK — wrap heavy models in a process-level cache like
    get_annotator does. A test factory can raise on a poison token to
    exercise the distributed failure path on real workers (where the
    driver-side swap_annotator cannot reach)."""

    @F.pandas_udf(SAFE_ANNO_SCHEMA)
    def _safe(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        model = factory() if factory is not None else get_annotator()
        for token_lists in it:
            annos, errs = [], []
            for toks in token_lists:
                try:
                    annos.append(
                        model.annotate(list(toks)) if toks is not None else []
                    )
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — the catch IS the operator
                    annos.append([])
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({"anno": annos, "error": errs})

    return _safe


def annotate_sentences(
    sents: DataFrame, tokens_col: str = "tokens", keys: list[str] | None = None
) -> DataFrame:
    """Explode annotated tokens to one relational row per token:
    keys + (tok_ix, form, lemma, upos, head, deprel)."""
    keys = keys or ["doc_id", "sent_num"]
    return (
        sents.withColumn("_anno", annotate_udf(F.col(tokens_col)))
        .select(*keys, F.explode("_anno").alias("t"))
        .select(
            *keys,
            F.col("t.ix").alias("tok_ix"),
            F.col("t.form").alias("form"),
            F.col("t.lemma").alias("lemma"),
            F.col("t.upos").alias("upos"),
            F.col("t.head").alias("head"),
            F.col("t.deprel").alias("deprel"),
        )
    )
