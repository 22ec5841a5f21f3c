"""Ported unit vectors from the reference's textreader tests:
BasicTextReaderTests, BlacklistCharacterSetTextReaderTests,
WhitelistCharacterSetTextReaderTests, RemoveAllDiacriticsTextReaderTests,
ConvertLongSTextReaderTests, ReplaceSomeTextReaderTests (all under
src/test/java/edu/berkeley/cs/nlp/ocular/data/textreader/)."""

import pytest

from ocular_spark.charset import (
    ACUTE_COMBINING,
    DIAERESIS_COMBINING,
    GRAVE_COMBINING,
    MACRON_COMBINING,
    TILDE_COMBINING,
)
from ocular_spark.textread import (
    BasicTextReader,
    BlacklistCharacterSetTextReader,
    ConvertLongSTextReader,
    RemoveAllDiacriticsTextReader,
    ReplaceSomeTextReader,
    WhitelistCharacterSetTextReader,
    normalize_lines_fast,
)

S1 = "ing th\\~q || | follies of thõsè, who éither ``sæek'' out th\\\"os\\`e wæys \"and\" means, which either are sq̃uccess lessons"


def test_basic_qtilde():
    tr = BasicTextReader()
    assert tr.read_characters("q̃") == ["q" + TILDE_COMBINING]
    assert tr.read_characters("thq̃r") == ["t", "h", "q" + TILDE_COMBINING, "r"]
    assert tr.read_characters("th\\~qr") == ["t", "h", "q" + TILDE_COMBINING, "r"]


def test_basic_stacked_diacritics():
    tr = BasicTextReader()
    assert tr.read_characters("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING) == [
        "n" + TILDE_COMBINING + MACRON_COMBINING + DIAERESIS_COMBINING + ACUTE_COMBINING + GRAVE_COMBINING
    ]


def test_basic_dia():
    tr = BasicTextReader()
    r = ["i", "n", "g", " ", "t", "h", "q" + TILDE_COMBINING, " ", "|", "|", " ", "|", " ",
         "f", "o", "l", "l", "i", "e", "s", " ", "o", "f", " ", "t", "h", "o" + TILDE_COMBINING,
         "s", "e" + GRAVE_COMBINING, ",", " ", "w", "h", "o", " ", "e" + ACUTE_COMBINING, "i",
         "t", "h", "e", "r", " ", '"', "s", "æ", "e", "k", '"', " ", "o", "u", "t", " ", "t",
         "h", "o" + DIAERESIS_COMBINING, "s", "e" + GRAVE_COMBINING, " ", "w", "æ", "y", "s",
         " ", '"', "a", "n", "d", '"', " ", "m", "e", "a", "n", "s", ",", " ", "w", "h", "i",
         "c", "h", " ", "e", "i", "t", "h", "e", "r", " ", "a", "r", "e", " ", "s",
         "q" + TILDE_COMBINING, "u", "c", "c", "e", "s", "s", " ", "l", "e", "s", "s", "o",
         "n", "s"]
    assert tr.read_characters(S1) == r


def test_basic_backslash():
    tr = BasicTextReader()
    r = ["t", "h", "i", "s", "\\\\", "t", "h", "a", "t", "\\\\", "t", "h", "e", "\\\\"]
    assert tr.read_characters("this\\\\that\\\\the\\\\") == r
    with pytest.raises(ValueError, match=r"Unrecognized escape sequence: \[\\t\]"):
        tr.read_characters("this\\that\\the\\")


def test_basic_no_escape_char():
    tr = BasicTextReader(treat_backslash_as_escape=False)
    assert tr.read_characters("th\\~qr\\\\x") == [
        "t", "h", "\\\\", "~", "q", "r", "\\\\", "\\\\", "x",
    ]


def test_blacklist():
    tr = BlacklistCharacterSetTextReader({"&", "$"}, BasicTextReader())
    assert tr.read_characters("thi&s tha$t t$he") == [
        "t", "h", "i", "s", " ", "t", "h", "a", "t", " ", "t", "h", "e",
    ]


def test_whitelist_default_and_consider_diacritics():
    s = "thi&s thá$t t$hè"
    for disregard in (None, False):
        kwargs = {} if disregard is None else {"disregard_diacritics": disregard}
        tr1 = WhitelistCharacterSetTextReader({"a", "e", "h", "i", "s", "t"}, BasicTextReader(), **kwargs)
        assert tr1.read_characters(s) == ["t", "h", "i", "s", " ", "t", "h", "t", " ", "t", "h"]
        tr2 = WhitelistCharacterSetTextReader({"a", "e", "h", "i", "s", "t", "\\'a"}, BasicTextReader(), **kwargs)
        assert tr2.read_characters(s) == [
            "t", "h", "i", "s", " ", "t", "h", "a" + ACUTE_COMBINING, "t", " ", "t", "h",
        ]
        tr3 = WhitelistCharacterSetTextReader({"a", "e", "h", "í", "s", "t"}, BasicTextReader(), **kwargs)
        assert tr3.read_characters(s) == ["t", "h", "s", " ", "t", "h", "t", " ", "t", "h"]


def test_whitelist_disregard_diacritics():
    s = "thi&s thá$t t$hè"
    tr1 = WhitelistCharacterSetTextReader(
        {"a", "e", "h", "i", "s", "t"}, BasicTextReader(), disregard_diacritics=True
    )
    assert tr1.read_characters(s) == [
        "t", "h", "i", "s", " ", "t", "h", "a" + ACUTE_COMBINING, "t", " ", "t", "h",
        "e" + GRAVE_COMBINING,
    ]
    tr2 = WhitelistCharacterSetTextReader(
        {"a", "e", "h", "i", "s", "t", "\\'a"}, BasicTextReader(), disregard_diacritics=True
    )
    assert tr2.read_characters(s) == [
        "t", "h", "i", "s", " ", "t", "h", "a" + ACUTE_COMBINING, "t", " ", "t", "h",
        "e" + GRAVE_COMBINING,
    ]
    tr3 = WhitelistCharacterSetTextReader(
        {"a", "e", "h", "í", "s", "t"}, BasicTextReader(), disregard_diacritics=True
    )
    assert tr3.read_characters(s) == [
        "t", "h", "s", " ", "t", "h", "a" + ACUTE_COMBINING, "t", " ", "t", "h",
        "e" + GRAVE_COMBINING,
    ]


def test_remove_diacritics():
    tr = RemoveAllDiacriticsTextReader(BasicTextReader())
    assert tr.read_characters("thq̃r") == ["t", "h", "q", "r"]
    assert tr.read_characters("th\\~qr") == ["t", "h", "q", "r"]
    assert tr.read_characters("\\`\\'ñ" + MACRON_COMBINING + DIAERESIS_COMBINING) == ["n"]
    r = ["i", "n", "g", " ", "t", "h", "q", " ", "|", "|", " ", "|", " ", "f", "o", "l", "l",
         "i", "e", "s", " ", "o", "f", " ", "t", "h", "o", "s", "e", ",", " ", "w", "h", "o",
         " ", "e", "i", "t", "h", "e", "r", " ", '"', "s", "æ", "e", "k", '"', " ", "o", "u",
         "t", " ", "t", "h", "o", "s", "e", " ", "w", "æ", "y", "s", " ", '"', "a", "n", "d",
         '"', " ", "m", "e", "a", "n", "s", ",", " ", "w", "h", "i", "c", "h", " ", "e", "i",
         "t", "h", "e", "r", " ", "a", "r", "e", " ", "s", "q", "u", "c", "c", "e", "s", "s",
         " ", "l", "e", "s", "s", "o", "n", "s"]
    assert tr.read_characters(S1) == r


S1_LONG_S = "ing th\\~q || | follies of thõsè, who éither ``sæek'' out th\\\"os\\`e wæys \"and\" means, which either are sq̃uccess confession asi \\\\lessons"


def test_convert_long_s():
    tr = ConvertLongSTextReader(BasicTextReader())
    assert tr.read_characters("thõsè") == ["t", "h", "o" + TILDE_COMBINING, "ſ", "e" + GRAVE_COMBINING]
    assert tr.read_characters("si") == ["ſ", "i"]
    assert tr.read_characters("sin") == ["ſ", "i", "n"]
    assert tr.read_characters("asi") == ["a", "ſ", "i"]
    assert tr.read_characters("ssi") == ["ſ", "s", "i"]
    assert tr.read_characters("assi") == ["a", "ſ", "s", "i"]
    assert tr.read_characters("ssin") == ["ſ", "s", "i", "n"]
    assert tr.read_characters("assin") == ["a", "ſ", "s", "i", "n"]
    r = ["i", "n", "g", " ", "t", "h", "q" + TILDE_COMBINING, " ", "|", "|", " ", "|", " ",
         "f", "o", "l", "l", "i", "e", "s", " ", "o", "f", " ", "t", "h", "o" + TILDE_COMBINING,
         "ſ", "e" + GRAVE_COMBINING, ",", " ", "w", "h", "o", " ", "e" + ACUTE_COMBINING, "i",
         "t", "h", "e", "r", " ", '"', "ſ", "æ", "e", "k", '"', " ", "o", "u", "t", " ", "t",
         "h", "o" + DIAERESIS_COMBINING, "ſ", "e" + GRAVE_COMBINING, " ", "w", "æ", "y", "s",
         " ", '"', "a", "n", "d", '"', " ", "m", "e", "a", "n", "s", ",", " ", "w", "h", "i",
         "c", "h", " ", "e", "i", "t", "h", "e", "r", " ", "a", "r", "e", " ", "ſ",
         "q" + TILDE_COMBINING, "u", "c", "c", "e", "ſ", "s", " ", "c", "o", "n", "f", "e",
         "ſ", "s", "i", "o", "n", " ", "a", "ſ", "i", " ", "\\\\", "l", "e", "ſ", "ſ", "o",
         "n", "s"]
    assert tr.read_characters(S1_LONG_S) == r


def test_convert_long_s_remove_dia():
    tr = ConvertLongSTextReader(RemoveAllDiacriticsTextReader(BasicTextReader()))
    r = ["i", "n", "g", " ", "t", "h", "q", " ", "|", "|", " ", "|", " ", "f", "o", "l", "l",
         "i", "e", "s", " ", "o", "f", " ", "t", "h", "o", "ſ", "e", ",", " ", "w", "h", "o",
         " ", "e", "i", "t", "h", "e", "r", " ", '"', "ſ", "æ", "e", "k", '"', " ", "o", "u",
         "t", " ", "t", "h", "o", "ſ", "e", " ", "w", "æ", "y", "s", " ", '"', "a", "n", "d",
         '"', " ", "m", "e", "a", "n", "s", ",", " ", "w", "h", "i", "c", "h", " ", "e", "i",
         "t", "h", "e", "r", " ", "a", "r", "e", " ", "ſ", "q", "u", "c", "c", "e", "ſ", "s",
         " ", "c", "o", "n", "f", "e", "ſ", "s", "i", "o", "n", " ", "a", "ſ", "i", " ",
         "\\\\", "l", "e", "ſ", "ſ", "o", "n", "s"]
    assert tr.read_characters(S1_LONG_S) == r


def _join(chars):
    return "".join(chars)


def test_replace_some_1():
    tr = ReplaceSomeTextReader([(["a", "b"], ["x", "y", "z"], 3)], BasicTextReader())
    assert _join(tr.read_characters("ab1ab2ab3ab4ab5ab6ab7ab8")) == "ab1ab2xyz3ab4ab5xyz6ab7ab8"


def test_replace_some_2():
    tr = ReplaceSomeTextReader([(["a", "b"], ["x", "y", "z"], 4)], BasicTextReader())
    assert _join(tr.read_characters("ab1ab2ab3ab4ab5ab6ab7ab8")) == "ab1ab2ab3xyz4ab5ab6ab7xyz8"


def test_replace_some_3():
    tr = ReplaceSomeTextReader([(["a", "b"], ["x", "y", "z"], 1)], BasicTextReader())
    assert _join(tr.read_characters("ab")) == "xyz"


def test_replace_some_4():
    tr = ReplaceSomeTextReader([(["a", "b"], ["x", "y", "z"], 4)], BasicTextReader())
    assert _join(tr.read_characters("ab1ab2ab3ab4ab5ab6ab7ab")) == "ab1ab2ab3xyz4ab5ab6ab7xyz"


def test_replace_some_5():
    tr = ReplaceSomeTextReader(
        [(["a", "b"], ["x", "y", "z"], 3), (["y", "z"], ["e"], 2)], BasicTextReader()
    )
    assert _join(tr.read_characters("ab1ab2ab3ab4ab5ab6ab7ab8")) == "ab1ab2xyz3ab4ab5xe6ab7ab8"


def test_replace_some_6():
    tr = ReplaceSomeTextReader([(["x", "x"], ["a"], 1)], BasicTextReader())
    assert _join(tr.read_characters("xxxx")) == "aa"


def test_replace_some_7():
    tr = ReplaceSomeTextReader([(["x", "x"], ["a", "x"], 1)], BasicTextReader())
    assert _join(tr.read_characters("xxxx")) == "axax"


def test_replace_some_stateful_across_lines():
    # occurrence counter persists across lines (reference keeps it as a field)
    tr = ReplaceSomeTextReader([(["a", "b"], ["z"], 2)], BasicTextReader())
    assert _join(tr.read_characters("ab")) == "ab"
    assert _join(tr.read_characters("ab")) == "z"
    assert _join(tr.read_characters("ab")) == "ab"


def test_fast_path_matches_slow_path():
    readers = [
        BasicTextReader(),
        BlacklistCharacterSetTextReader({"&", "$"}, BasicTextReader()),
        ConvertLongSTextReader(RemoveAllDiacriticsTextReader(BasicTextReader())),
        WhitelistCharacterSetTextReader(set("aehist"), BasicTextReader()),
    ]
    lines = ["plain ascii lines sassy si ssi", "thi&s tha$t", S1, S1_LONG_S, "", "sis"]
    for tr in readers:
        fast = normalize_lines_fast(lines, tr)
        slow = [tr.read_characters(l) for l in lines]
        assert fast == slow, repr(tr)
