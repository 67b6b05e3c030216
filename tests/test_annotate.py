"""Annotator-stage tests: rule cascade, swap seam, 10-column rendering."""
from __future__ import annotations

from puddin_spark.annotate import RuleAnnotator, get_annotator, swap_annotator


def test_upos_cascade():
    a = RuleAnnotator()
    assert a.upos(".") == "PUNCT"
    assert a.upos("3,14") == "NUM"
    assert a.upos("the") == "DET"
    assert a.upos("they") == "PRON"
    assert a.upos("with") == "ADP"
    assert a.upos("and") == "CCONJ"
    assert a.upos("would") == "AUX"
    assert a.upos("quickly") == "ADV"
    assert a.upos("running") == "VERB"
    assert a.upos("walked") == "VERB"
    assert a.upos("joyful") == "ADJ"
    assert a.upos("house") == "NOUN"
    # length guards: short words fall through the suffix rules
    assert a.upos("fly") == "NOUN"  # len 3, no ADV
    assert a.upos("red") == "NOUN"  # len 3, no VERB


def test_lemma_rules():
    a = RuleAnnotator()
    assert a.lemma("running", "VERB") == "runn"
    assert a.lemma("walked", "VERB") == "walk"
    assert a.lemma("houses", "NOUN") == "house"
    assert a.lemma("glass", "NOUN") == "glass"  # no 'ss' strip
    assert a.lemma("The", "DET") == "the"


def test_head_scheme_first_verb_root():
    a = RuleAnnotator()
    rows = a.annotate(["the", "dog", "walked", "quickly", "."])
    by_ix = {r[0]: r for r in rows}
    assert by_ix[3][5] == "root" and by_ix[3][4] == 0  # walked = root
    assert by_ix[1] == (1, "the", "the", "DET", 3, "det")
    assert by_ix[5] == (5, ".", ".", "PUNCT", 3, "punct")


def test_root_fallbacks():
    a = RuleAnnotator()
    # no verb -> first AUX
    rows = a.annotate(["it", "is", "blue"])
    assert rows[1][4:] == (0, "root")
    # no verb/aux -> first non-punct
    rows = a.annotate([".", "dog"])
    assert rows[1][4:] == (0, "root") and rows[0][4:] == (2, "punct")
    # all punct -> token 1
    rows = a.annotate(["!", "?"])
    assert rows[0][4:] == (0, "root")


def test_swap_seam(spark):
    """Any object with annotate(tokens) plugs in process-wide (the Stanza
    drop-in contract) — driver-side check; executors re-init their own."""

    class Upper:
        def annotate(self, toks):
            return [(i + 1, t, t.upper(), "X", 0 if i == 0 else 1,
                     "root" if i == 0 else "dep") for i, t in enumerate(toks)]

    orig = get_annotator()
    try:
        swap_annotator(Upper())
        assert get_annotator().annotate(["ab"])[0][2] == "AB"
    finally:
        swap_annotator(orig)


def test_conllu_annotated_rendering(spark):
    from puddin_spark.pipeline import conllu_skeleton

    sents = spark.createDataFrame(
        [("d1", 1, "The dog walked home.")],
        "doc_id string, sent_num int, sent_text string",
    )
    out = conllu_skeleton(sents, annotated=True).collect()[0].conllu
    lines = out.splitlines()
    assert lines[0] == "# newdoc id = d1"
    toks = [l.split("\t") for l in lines[3:]]
    assert all(len(t) == 10 for t in toks)
    # 10 columns: ID FORM LEMMA UPOS XPOS FEATS HEAD DEPREL DEPS MISC
    walked = next(t for t in toks if t[1] == "walked")
    assert walked[2:4] == ["walk", "VERB"]
    assert walked[6:8] == ["0", "root"]
    the = next(t for t in toks if t[1] == "The")
    assert the[2:4] == ["the", "DET"] and the[7] == "det"
    assert all(t[4] == "_" and t[5] == "_" and t[8] == "_" and t[9] == "_" for t in toks)
