"""Byte-identity + label-parity unit tests for the pure rules (no Spark).

Golden expectations in tests/fixtures/golden.json were extracted from the
reference demo artifacts (see tools/extract_fixtures.py): raw input text, the
mid-stage (post C1-C4) text, the first-match exclusion label, and the final
scrubbed text for kept docs.
"""
from __future__ import annotations

import json
from pathlib import Path

import pytest

from puddin_spark import rules

GOLDEN = json.loads(
    (Path(__file__).parent / "fixtures" / "golden.json").read_text()
)
IDS = [r["text_id"] for r in GOLDEN]


@pytest.mark.parametrize("rec", GOLDEN, ids=IDS)
def test_stage1_byte_identity(rec):
    """C1-C4 scrub must reproduce the reference mid-state text exactly."""
    assert rules.scrub_stage1(rec["raw"]) == rec["mid"]


@pytest.mark.parametrize("rec", GOLDEN, ids=IDS)
def test_label_parity(rec):
    got = rules.classify(rules.scrub_stage1(rec["raw"]))
    want = None if rec["label"] == "keep" else rec["label"]
    assert got == want


@pytest.mark.parametrize(
    "rec", [r for r in GOLDEN if r["label"] == "keep"], ids=[r["text_id"] for r in GOLDEN if r["label"] == "keep"]
)
def test_full_scrub_byte_identity(rec):
    """Full scrub of kept docs must be byte-identical to the final-df text."""
    assert rules.scrub(rec["raw"]) == rec["clean"]


def test_unk_regex_quirk():
    """The ?unk stage can never match the literal sentinel (pandas regex
    quirk, parse_pile.py:1009) — sentinel docs fall through to '_wrd'."""
    assert rules.UNK_AS_REGEX.search("x <__?UNK__> y") is None
    assert rules.classify("plain text with <__?UNK__> inside") == "_wrd"
    # ...but the regex does match the de-optionalized variants
    assert rules.UNK_AS_REGEX.search("x <__UNK__> y")
    assert rules.UNK_AS_REGEX.search("x <_UNK__> y")


def test_literal_brace_quirks():
    """'{2:3}' and '{3:}' are literals under Python re (the reference's
    latent bugs, pile_regex_imports.py:23,31) — must NOT act as quantifiers."""
    # likely_url's 4th alternative requires the literal '{2:3}' text
    assert rules.LIKELY_URL.fullmatch("http://www.example.co") is None
    # a0wrd 2nd alternative needs literal '{3:}'; 1st alternative still works
    assert rules.MIXED_LETTER_DIGIT.search("mp4converter")
    assert not rules.MIXED_LETTER_DIGIT.search("plain words only")


def test_is_jsonish():
    assert rules.is_jsonish('{"a": 1}')
    # quote-stripping quirk (parse_pile.py:1430): '"5"' -> '5' -> valid JSON
    assert rules.is_jsonish('"5"')
    assert not rules.is_jsonish("Normal sentence here.")


def test_segmentation_basic():
    sents = rules.segment_sentences("First sentence. Second one! Third?\n\nNew para here.")
    assert sents[0] == "First sentence."
    assert "New para here." in sents


# --- property tests: the hot-path substring guards are semantics-free ---

from hypothesis import given, settings, strategies as st

_CHARS = st.text(
    alphabet=st.sampled_from(
        list("abcdefgh XYZ_0129 \n.|!<>={}\"'[]/url=:-()#*~`\\@&;,?’人")
    ),
    max_size=120,
)


def _classify_unguarded(mid):
    if rules.UNK_AS_REGEX.search(mid):
        return "?unk"
    if rules.DEFWIKI.search(mid) or rules.WIKIPAT.search(mid):
        return "wiki"
    if rules.LIKELY_HTML.search(mid):
        return "html"
    for label, pat in [
        ("json", rules.JSON_LIKE),
        ("code", rules.CODE_LIKE),
        ("_wrd", rules.UNDERSCORE_WORD),
        ("a0wrd", rules.MIXED_LETTER_DIGIT),
        ("punc", rules.MIDWORD_PUNC),
    ]:
        if pat.search(mid):
            return label
    return None


@settings(max_examples=500, deadline=None)
@given(_CHARS)
def test_guarded_classify_equals_unguarded(t):
    assert rules.classify(t) == _classify_unguarded(t)


@settings(max_examples=500, deadline=None)
@given(_CHARS)
def test_guarded_scrub_equals_unguarded(t):
    mid = rules.transliterate(t)
    mid = rules.BRACKET_URL.sub(r"\1", mid)
    mid = rules.LIKELY_URL.sub(" ", mid)
    mid = rules.MISSING_SPACE.sub(r"\1\3 \2\4", mid)
    assert rules.scrub_stage1(t) == mid
    full = rules.EOL_ABBR.sub(
        r"\1\2\5\6 \3\4", rules.PUNC_ONLY.sub(r"\1\2\3\4\5\6\7\n\n", mid)
    )
    assert rules.scrub(t) == full


def test_classify_labels_are_canonical():
    """Every label classify can emit is in the canonical order list
    (validate_data_group.py:338-339)."""
    emitted = {
        rules.classify(t)
        for t in [
            "x <__UNK__> y", "<nowiki>", "a [[p|l}} b", "<b>x</b>",
            '{"a":{"b":', "x == true", "a_b", "mp4", "a...b",
        ]
    }
    assert None not in emitted and emitted <= set(rules.EXCL_TYPES)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_transliterate_always_ascii_and_idempotent(t):
    from puddin_spark.translit import transliterate

    out = transliterate(t)
    assert out.isascii() or out == ""  # ASCII always (sentinel is ASCII)
    assert transliterate(out) == out  # idempotent on its own output


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=127), max_size=200))
def test_transliterate_ascii_passthrough(t):
    from puddin_spark.translit import transliterate

    assert transliterate(t) == t
