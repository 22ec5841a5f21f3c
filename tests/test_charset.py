"""Ported unit vectors from the reference's
src/test/java/.../data/textreader/CharsetTests.java and CharIndexerTests.java."""

import pytest

from ocular_spark.charset import (
    ACUTE_COMBINING,
    ACUTE_ESCAPE,
    DIAERESIS_COMBINING,
    DIAERESIS_ESCAPE,
    GRAVE_COMBINING,
    GRAVE_ESCAPE,
    MACRON_COMBINING,
    MACRON_ESCAPE,
    TILDE_COMBINING,
    TILDE_ESCAPE,
    CharIndexer,
    fully_escape_char,
    is_punctuation_char,
    normalize_char,
    normalize_char_separate_diacritics,
    read_normalize_characters,
    remove_any_diacritic_from_char,
    unescape_char,
)


def test_is_punctuation_char():
    assert not is_punctuation_char("t")
    assert not is_punctuation_char("q̃")
    assert not is_punctuation_char("\\~q")
    assert not is_punctuation_char("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING)
    assert is_punctuation_char(";")
    assert is_punctuation_char("\\\\")
    with pytest.raises(ValueError):
        is_punctuation_char(";;")


def test_unescape_char():
    assert unescape_char("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING) == (
        "ñ" + MACRON_COMBINING + DIAERESIS_COMBINING + ACUTE_COMBINING + GRAVE_COMBINING
    )
    assert unescape_char(
        "\\`\\'n" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING
    ) == ("ñ" + MACRON_COMBINING + DIAERESIS_COMBINING + ACUTE_COMBINING + GRAVE_COMBINING)
    assert unescape_char(
        "\\`\\'q" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING
    ) == (
        "q"
        + TILDE_COMBINING
        + MACRON_COMBINING
        + DIAERESIS_COMBINING
        + ACUTE_COMBINING
        + GRAVE_COMBINING
    )
    assert unescape_char("ñ") == "ñ"
    assert unescape_char("\\~n") == "ñ"
    assert unescape_char("q" + TILDE_COMBINING) == "q" + TILDE_COMBINING
    assert unescape_char("\\~q") == "q" + TILDE_COMBINING
    assert unescape_char("\\ii") == "ı"
    assert unescape_char("ı") == "ı"
    assert unescape_char("\\\\") == "\\"


def test_unescape_char_precomposed_only():
    assert unescape_char("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING, True) == (
        GRAVE_ESCAPE + ACUTE_ESCAPE + DIAERESIS_ESCAPE + MACRON_ESCAPE + "ñ"
    )
    assert unescape_char(
        "\\`\\'n" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING, True
    ) == (GRAVE_ESCAPE + ACUTE_ESCAPE + DIAERESIS_ESCAPE + MACRON_ESCAPE + "ñ")
    assert unescape_char(
        "\\`\\'q" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING, True
    ) == (
        GRAVE_ESCAPE + ACUTE_ESCAPE + DIAERESIS_ESCAPE + MACRON_ESCAPE + TILDE_ESCAPE + "q"
    )
    assert unescape_char("ñ", True) == "ñ"
    assert unescape_char("\\~n", True) == "ñ"
    assert unescape_char("q" + TILDE_COMBINING, True) == "\\~q"
    assert unescape_char("\\~q", True) == "\\~q"
    assert unescape_char("\\ii", True) == "ı"
    assert unescape_char("ı", True) == "ı"
    assert unescape_char("\\\\", True) == "\\"


def test_fully_escape_char():
    expected_n = (
        GRAVE_ESCAPE + ACUTE_ESCAPE + DIAERESIS_ESCAPE + MACRON_ESCAPE + TILDE_ESCAPE + "n"
    )
    assert fully_escape_char("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING) == expected_n
    assert (
        fully_escape_char("\\`\\'n" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING)
        == expected_n
    )
    assert fully_escape_char(
        "\\`\\'q" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING
    ) == (
        GRAVE_ESCAPE + ACUTE_ESCAPE + DIAERESIS_ESCAPE + MACRON_ESCAPE + TILDE_ESCAPE + "q"
    )
    assert fully_escape_char("ñ") == "\\~n"
    assert fully_escape_char("\\~n") == "\\~n"
    assert fully_escape_char("q" + TILDE_COMBINING) == "\\~q"
    assert fully_escape_char("\\~q") == "\\~q"
    assert fully_escape_char("\\ii") == "\\ii"
    assert fully_escape_char("ı") == "\\ii"
    assert fully_escape_char("\\\\") == "\\\\"


def test_normalize_char_separate_diacritics():
    stacked = [TILDE_COMBINING, MACRON_COMBINING, DIAERESIS_COMBINING, ACUTE_COMBINING, GRAVE_COMBINING]
    assert (
        normalize_char_separate_diacritics("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING)[1]
        == stacked
    )
    assert (
        normalize_char_separate_diacritics(
            "\\`\\'n" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING
        )[1]
        == stacked
    )
    assert (
        normalize_char_separate_diacritics(
            "\\`\\'q" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING
        )[1]
        == stacked
    )
    assert normalize_char_separate_diacritics("t")[1] == []
    assert normalize_char_separate_diacritics("ñ")[1] == [TILDE_COMBINING]
    assert normalize_char_separate_diacritics("\\~n")[1] == [TILDE_COMBINING]
    assert normalize_char_separate_diacritics("q̃")[1] == [TILDE_COMBINING]
    assert normalize_char_separate_diacritics("q" + TILDE_COMBINING)[1] == [TILDE_COMBINING]
    assert normalize_char_separate_diacritics("\\~q")[1] == [TILDE_COMBINING]
    assert normalize_char_separate_diacritics("\\\\")[1] == []

    assert normalize_char_separate_diacritics("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING)[0] == "n"
    assert (
        normalize_char_separate_diacritics(
            "\\`\\'n" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING
        )[0]
        == "n"
    )
    assert (
        normalize_char_separate_diacritics(
            "\\`\\'q" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING
        )[0]
        == "q"
    )
    assert normalize_char_separate_diacritics("t")[0] == "t"
    assert normalize_char_separate_diacritics("ñ")[0] == "n"
    assert normalize_char_separate_diacritics("\\~n")[0] == "n"
    assert normalize_char_separate_diacritics("q̃")[0] == "q"
    assert normalize_char_separate_diacritics("q" + TILDE_COMBINING)[0] == "q"
    assert normalize_char_separate_diacritics("\\~q")[0] == "q"
    assert normalize_char_separate_diacritics("\\\\")[0] == "\\\\"

    with pytest.raises(ValueError):
        normalize_char_separate_diacritics(MACRON_ESCAPE + TILDE_COMBINING)


def test_remove_any_diacritic_from_char():
    assert remove_any_diacritic_from_char("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING) == "n"
    assert (
        remove_any_diacritic_from_char(
            "\\`\\'n" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING
        )
        == "n"
    )
    assert (
        remove_any_diacritic_from_char(
            "\\`\\'q" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING
        )
        == "q"
    )
    assert remove_any_diacritic_from_char("t") == "t"
    assert remove_any_diacritic_from_char("ñ") == "n"
    assert remove_any_diacritic_from_char("\\~n") == "n"
    assert remove_any_diacritic_from_char("q̃") == "q"
    assert remove_any_diacritic_from_char("q" + TILDE_COMBINING) == "q"
    assert remove_any_diacritic_from_char("\\~q") == "q"
    assert remove_any_diacritic_from_char("\\\\") == "\\\\"


def test_normalize_char():
    assert normalize_char("t") == "t"
    assert normalize_char("q̃") == "q" + TILDE_COMBINING
    assert normalize_char("q" + TILDE_COMBINING) == "q" + TILDE_COMBINING
    assert normalize_char("\\~q") == "q" + TILDE_COMBINING
    assert normalize_char("ñ") == "n" + TILDE_COMBINING
    assert normalize_char("\\~n") == "n" + TILDE_COMBINING
    assert normalize_char("á") == "a" + ACUTE_COMBINING
    assert normalize_char("ı") == "ı"
    assert normalize_char("\\ii") == "ı"
    assert normalize_char("a͇") == "a͇"
    stacked = (
        TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING + ACUTE_COMBINING + GRAVE_COMBINING
    )
    assert normalize_char("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING) == "n" + stacked
    assert (
        normalize_char("\\`\\'n" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING)
        == "n" + stacked
    )
    assert (
        normalize_char("\\`\\'q" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING)
        == "q" + stacked
    )
    assert normalize_char("\\\\") == "\\\\"


def test_read_normalize_characters():
    assert read_normalize_characters("ab̑cd") == ["a", "b̑", "c", "d"]
    assert read_normalize_characters("ab︠c︡d") == ["a", "b︠", "c︡", "d"]
    assert read_normalize_characters("ab͡cd") == ["a", "b͡", "c", "d"]
    assert read_normalize_characters("tau͡gaam") == ["t", "a", "u͡", "g", "a", "a", "m"]


def test_char_indexer():
    i = CharIndexer()
    ae = TILDE_ESCAPE + "a"
    ac = "a" + TILDE_COMBINING
    ee = TILDE_ESCAPE + "e"
    ec = "e" + TILDE_COMBINING
    ne = TILDE_ESCAPE + "n"
    nc = "n" + TILDE_COMBINING
    np_ = "ñ"

    i.index(["a", "b", ec])
    assert i.contains("a")
    assert i.contains("b")
    assert i.contains(ec)
    assert i.contains(ee)
    assert i.get_index("a") == 0
    assert i.get_object(0) == "a"
    assert i.get_index("b") == 1
    assert i.get_object(1) == "b"
    assert i.get_index(ec) == 2
    assert i.get_object(2) == ec
    assert i.size() == 3

    assert not i.contains(ae)
    assert not i.contains(ac)
    assert i.get_index(ae) == 3
    assert i.contains(ae)
    assert i.contains(ac)
    assert i.get_index(ac) == 3
    assert i.size() == 4

    assert not i.contains(ne)
    assert not i.contains(nc)
    assert not i.contains(np_)
    assert i.get_index(np_) == 4
    assert i.get_object(4) == nc
    assert i.contains(ne)
    assert i.contains(nc)
    assert i.contains(np_)
    assert i.get_index(ne) == 4
    assert i.get_index(nc) == 4
    assert i.get_object(4) == nc
    assert i.size() == 5

    assert not i.locked()
    i.lock()
    assert i.locked()
