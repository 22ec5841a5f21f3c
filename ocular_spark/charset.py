"""Character algebra for the historical-print charset.

Re-expresses the normalization semantics of the reference's
``data/textreader/Charset.java`` (tberg12/ocular): one logical
"character" is a base letter plus any diacritics, which may appear in
the input as escape sequences (``\\'a``), precomposed codepoints
(``á``), or Unicode combining marks (``a`` + U+0301).  The normalized
form is ``base letter + combining marks`` ordered: precomposed-derived
marks first, then input combining marks (left-associative), then
escape-derived marks innermost-first (right-associative) — see the
ordering spec in Charset.java:335-353.

Pure Python, no Spark dependency: this module is imported both by the
driver (model building) and inside Arrow UDF kernels.
"""

from __future__ import annotations

import unicodedata
from typing import Dict, List, Sequence, Set, Tuple

SPACE = " "
HYPHEN = "-"

LOWERCASE_LATIN_LETTERS: Set[str] = set("abcdefghijklmnopqrstuvwxyz")
LOWERCASE_VOWELS: Set[str] = set("aeiou")
LIGATURES: Dict[str, str] = {"Æ": "AE", "æ": "ae", "Œ": "OE", "œ": "oe"}
LONG_S = "ſ"  # ſ
BANNED_CHARS: Set[str] = {"@", "$", "%"}
# Punctuation made available to every language regardless of corpus.
UNIV_PUNC: Set[str] = {"&", ".", ",", "[", "]", HYPHEN, "*", "§", "¶"}

GRAVE_COMBINING = "̀"
ACUTE_COMBINING = "́"
CIRCUMFLEX_COMBINING = "̂"
TILDE_COMBINING = "̃"
MACRON_COMBINING = "̄"
BREVE_COMBINING = "̆"
DIAERESIS_COMBINING = "̈"
CEDILLA_COMBINING = "̧"
# NOTE: the reference writes "\0331" (an octal escape, i.e. "\033" + "1")
# for MACRON_BELOW (Charset.java:57).  We reproduce the *intended*
# codepoint U+0331; the reference never exercises it in tests.
MACRON_BELOW_COMBINING = "̱"

GRAVE_ESCAPE = "\\`"
ACUTE_ESCAPE = "\\'"
CIRCUMFLEX_ESCAPE = "\\^"
TILDE_ESCAPE = "\\~"
MACRON_ESCAPE = "\\-"
BREVE_ESCAPE = "\\v"
DIAERESIS_ESCAPE = '\\"'
CEDILLA_ESCAPE = "\\c"
MACRON_BELOW_ESCAPE = "\\_"

_ESCAPE_TO_COMBINING: Dict[str, str] = {
    GRAVE_ESCAPE: GRAVE_COMBINING,
    ACUTE_ESCAPE: ACUTE_COMBINING,
    CIRCUMFLEX_ESCAPE: CIRCUMFLEX_COMBINING,
    TILDE_ESCAPE: TILDE_COMBINING,
    MACRON_ESCAPE: MACRON_COMBINING,
    BREVE_ESCAPE: BREVE_COMBINING,
    DIAERESIS_ESCAPE: DIAERESIS_COMBINING,
    CEDILLA_ESCAPE: CEDILLA_COMBINING,
    MACRON_BELOW_ESCAPE: MACRON_BELOW_COMBINING,
}

COMBINING_TO_ESCAPE: Dict[str, str] = {v: k for k, v in _ESCAPE_TO_COMBINING.items()}


def is_combining_char(c: str) -> bool:
    """Combining-mark ranges recognized by the reference (Charset.java:59-65)."""
    o = ord(c)
    return (
        0x0300 <= o <= 0x036F
        or 0x1AB0 <= o <= 0x1AFF
        or 0x1DC0 <= o <= 0x1DFF
        or 0x20D0 <= o <= 0x20FF
        or 0xFE20 <= o <= 0xFE2F
    )


def _escape_to_combining(esc: str) -> str:
    try:
        return _ESCAPE_TO_COMBINING[esc]
    except KeyError:
        raise ValueError("Unrecognized escape sequence: [%s]" % esc) from None


# Precomposed char -> escaped form (Charset.java:121-212).
_P2E_PAIRS = [
    ("à", "\\`a"), ("á", "\\'a"), ("â", "\\^a"), ("ä", '\\"a'), ("ã", "\\~a"), ("ā", "\\-a"), ("ă", "\\va"),
    ("è", "\\`e"), ("é", "\\'e"), ("ê", "\\^e"), ("ë", '\\"e'), ("ẽ", "\\~e"), ("ē", "\\-e"), ("ĕ", "\\ve"),
    ("ì", "\\`i"), ("í", "\\'i"), ("î", "\\^i"), ("ï", '\\"i'), ("ĩ", "\\~i"), ("ī", "\\-i"), ("ĭ", "\\vi"),
    ("ò", "\\`o"), ("ó", "\\'o"), ("ô", "\\^o"), ("ö", '\\"o'), ("õ", "\\~o"), ("ō", "\\-o"), ("ŏ", "\\vo"),
    ("ù", "\\`u"), ("ú", "\\'u"), ("û", "\\^u"), ("ü", '\\"u'), ("ũ", "\\~u"), ("ū", "\\-u"), ("ŭ", "\\vu"),
    ("ñ", "\\~n"), ("ç", "\\cc"),
    ("À", "\\`A"), ("Á", "\\'A"), ("Â", "\\^A"), ("Ä", '\\"A'), ("Ã", "\\~A"), ("Ā", "\\-A"), ("Ă", "\\vA"),
    ("È", "\\`E"), ("É", "\\'E"), ("Ê", "\\^E"), ("Ë", '\\"E'), ("Ẽ", "\\~E"), ("Ē", "\\-E"), ("Ĕ", "\\vE"),
    ("Ì", "\\`I"), ("Í", "\\'I"), ("Î", "\\^I"), ("Ï", '\\"I'), ("Ĩ", "\\~I"), ("Ī", "\\-I"), ("Ĭ", "\\vI"),
    ("Ò", "\\`O"), ("Ó", "\\'O"), ("Ô", "\\^O"), ("Ö", '\\"O'), ("Õ", "\\~O"), ("Ō", "\\-O"), ("Ŏ", "\\vO"),
    ("Ù", "\\`U"), ("Ú", "\\'U"), ("Û", "\\^U"), ("Ü", '\\"U'), ("Ũ", "\\~U"), ("Ū", "\\-U"), ("Ŭ", "\\vU"),
    ("Ñ", "\\~N"), ("Ç", "\\cC"),
]
PRECOMPOSED_TO_ESCAPED: Dict[str, str] = dict(_P2E_PAIRS)


def _build_precomposed_to_combined() -> Dict[str, str]:
    out: Dict[str, str] = {}
    for pre, esc in PRECOMPOSED_TO_ESCAPED.items():
        base = esc[-1]
        codes = esc[:-1]
        if len(codes) % 2 != 0:
            raise ValueError("problem with precomposed mapping: " + esc)
        combined = base
        # innermost escape first (Charset.java:221-224 walks right-to-left)
        for i in range(len(codes) - 2, -1, -2):
            combined += _escape_to_combining(codes[i : i + 2])
        out[pre] = combined
    return out


PRECOMPOSED_TO_COMBINED: Dict[str, str] = _build_precomposed_to_combined()
COMBINED_TO_PRECOMPOSED: Dict[str, str] = {v: k for k, v in PRECOMPOSED_TO_COMBINED.items()}

CHARS_THAT_CAN_BE_REPLACED: Set[str] = LOWERCASE_LATIN_LETTERS | {"ç"}
VALID_CHAR_SUBSTITUTIONS: Set[str] = LOWERCASE_LATIN_LETTERS
CHARS_THAT_CAN_DOUBLED: Set[str] = LOWERCASE_LATIN_LETTERS
CHARS_THAT_CAN_BE_DECORATED_WITH_AN_ELISION_TILDE: Set[str] = LOWERCASE_LATIN_LETTERS
CHARS_THAT_CAN_BE_ELIDED: Set[str] = LOWERCASE_LATIN_LETTERS
COMBINING_DIACRITICS_THAT_CAN_BE_DISREGARDED: Set[str] = {GRAVE_COMBINING, ACUTE_COMBINING}
LETTERS_WITH_DISREGARDEDABLE_DIACRITICS: Set[str] = LOWERCASE_VOWELS


def _is_alphabetic(c: str) -> bool:
    # Java Character.isAlphabetic ~= Unicode categories L* + Nl
    cat = unicodedata.category(c)
    return cat.startswith("L") or cat == "Nl"


def _is_punct_codepoint(c: str) -> bool:
    return not c.isspace() and not _is_alphabetic(c) and unicodedata.category(c) != "Nd"


def is_punctuation_char(s: str) -> bool:
    return all(_is_punct_codepoint(c) for c in remove_any_diacritic_from_char(s))


def read_letter_and_normal_diacritics_at(line: str, offset: int) -> Tuple[str, List[str], int]:
    """Read one logical character at ``offset``.

    Returns (base letter, combining diacritics in normalized order,
    length consumed from the original string).  Mirrors
    Charset.readLetterAndNormalDiacriticsAt (Charset.java:414-475).
    """
    n = len(line)
    if offset >= n:
        raise ValueError("offset must be less than the line length")

    if line.startswith("\\\\", offset):
        return "\\\\", [], 2  # literal backslash is its own character

    escape_diacritics: List[str] = []  # innermost (nearest letter) first
    i = offset
    while i < n and line[i] == "\\":
        if i + 1 >= n:
            raise ValueError(
                "expected more after escape symbol, but found nothing: [%s]" % line[offset:]
            )
        escape_diacritics.insert(0, line[i : i + 2])
        i += 2

    if i >= n:
        raise ValueError("expected a letter after escape code, but found nothing: [%s]" % line[offset:])
    letter = line[i]
    if is_combining_char(letter):
        raise ValueError("found unexpected combining char: [%s]" % line[offset:])
    i += 1

    combining: List[str] = []
    while i < n and is_combining_char(line[i]):
        combining.append(line[i])
        i += 1

    deprecomposed = PRECOMPOSED_TO_COMBINED.get(letter)
    if deprecomposed is None:
        letter_only = letter
    else:
        letter_only = deprecomposed[0]
        combining = list(deprecomposed[1:]) + combining

    for esc in escape_diacritics:
        if esc == "\\i":
            if letter_only != "i":
                raise ValueError(
                    "the \\i escape sequence can only be used on the character 'i'"
                )
            letter_only = "ı"
        else:
            combining.append(_escape_to_combining(esc))

    if combining and not _is_alphabetic(letter_only):
        raise ValueError(
            "because there were diacritics, letter is expected, but something else was found: [%s]"
            % line[offset:]
        )

    return letter_only, combining, i - offset


def normalize_char_separate_diacritics(c: str) -> Tuple[str, List[str]]:
    letter, diacritics, length = read_letter_and_normal_diacritics_at(c, 0)
    if length != len(c):
        raise ValueError("Could not escape [%s]: contains more than one character" % c)
    return letter, diacritics


def normalize_char(c: str) -> str:
    letter, diacritics = normalize_char_separate_diacritics(c)
    return letter + "".join(diacritics)


def read_normalize_characters(line: str) -> List[str]:
    out: List[str] = []
    i = 0
    n = len(line)
    while i < n:
        letter, diacritics, length = read_letter_and_normal_diacritics_at(line, i)
        out.append(letter + "".join(diacritics))
        i += length
    return out


def unescape_char(c: str, precomposed_only: bool = False) -> str:
    """Render with precomposed + combining codepoints (Charset.java:503-549)."""
    if c == "\\\\":
        return "\\"
    base, diacritics = normalize_char_separate_diacritics(c)
    if not diacritics:
        return base

    parts: List[str] = []
    first = diacritics[0]
    precomposed = COMBINED_TO_PRECOMPOSED.get(base + first)
    if precomposed is not None:
        parts.append(precomposed)
    else:
        parts.append(base)
        if not precomposed_only:
            parts.append(first)

    if precomposed_only:
        prefix: List[str] = []
        for d in diacritics[1 if precomposed is not None else 0 :]:
            esc = COMBINING_TO_ESCAPE.get(d)
            if esc is not None:
                prefix.insert(0, esc)
            else:
                parts.append(_to_unicode_repr(d))
        return "".join(prefix) + "".join(parts)
    else:
        parts.extend(diacritics[1:])
        return "".join(parts)


def fully_escape_char(c: str) -> str:
    """Render as base char + explicit escapes (Charset.java:554-577)."""
    if c == "\\\\":
        return c
    base, diacritics = normalize_char_separate_diacritics(c)
    if base == "ı":
        base = "\\ii"
    if not diacritics:
        return base
    prefix: List[str] = []
    suffix: List[str] = []
    for d in diacritics:
        esc = COMBINING_TO_ESCAPE.get(d)
        if esc is not None:
            prefix.insert(0, esc)
        else:
            suffix.append(_to_unicode_repr(d))
    return "".join(prefix) + base + "".join(suffix)


def _to_unicode_repr(c: str) -> str:
    # StringHelper.toUnicode renders \\uXXXX; only hit for unmapped marks.
    return "".join("\\u%04x" % ord(ch) for ch in c)


def remove_any_diacritic_from_char(c: str) -> str:
    return normalize_char_separate_diacritics(c)[0]


def add_tilde(c: str) -> str:
    return normalize_char(c + TILDE_COMBINING)


class CharIndexer:
    """Normalizing string->int indexer (data/textreader/CharIndexer.java).

    Broadcast to executors as a frozen (list, dict) pair; character
    vocabulary is fixed at LM-initialization time.
    """

    __slots__ = ("_objects", "_index", "_locked")

    def __init__(self) -> None:
        self._objects: List[str] = []
        self._index: Dict[str, int] = {}
        self._locked = False

    def __contains__(self, obj: str) -> bool:
        return self.contains(obj)

    def contains(self, obj: str) -> bool:
        return normalize_char(obj) in self._index

    def get_index(self, obj: str) -> int:
        key = normalize_char(obj)
        idx = self._index.get(key)
        if idx is None:
            if self._locked:
                raise KeyError("indexer locked; unknown object: %r" % obj)
            idx = len(self._objects)
            self._index[key] = idx
            self._objects.append(key)
        return idx

    def index(self, objs: Sequence[str]) -> None:
        for o in objs:
            self.get_index(o)

    def locked(self) -> bool:
        return self._locked

    def lock(self) -> None:
        self._locked = True

    def size(self) -> int:
        return len(self._objects)

    def __len__(self) -> int:
        return len(self._objects)

    def get_object(self, index: int) -> str:
        return self._objects[index]

    def get_objects(self) -> List[str]:
        return list(self._objects)


# ---- index-space set builders (Charset.java:243-329) ----

def make_punct_set(indexer: CharIndexer) -> Set[int]:
    return {indexer.get_index(c) for c in indexer.get_objects() if is_punctuation_char(c)}


def make_can_be_replaced_set(indexer: CharIndexer) -> Set[int]:
    return {
        indexer.get_index(c)
        for c in indexer.get_objects()
        if c in CHARS_THAT_CAN_BE_REPLACED
    }


def make_valid_substitution_chars_set(indexer: CharIndexer) -> Set[int]:
    return {
        indexer.get_index(c)
        for c in indexer.get_objects()
        if c in VALID_CHAR_SUBSTITUTIONS
    }


def make_valid_doublable_set(indexer: CharIndexer) -> Set[int]:
    return {
        indexer.get_index(c) for c in indexer.get_objects() if c in CHARS_THAT_CAN_DOUBLED
    }


def make_can_be_elided_set(indexer: CharIndexer) -> Set[int]:
    return {
        indexer.get_index(c)
        for c in indexer.get_objects()
        if c in CHARS_THAT_CAN_BE_ELIDED
    }


def make_add_tilde_map(indexer: CharIndexer) -> Dict[int, int]:
    m: Dict[int, int] = {}
    for original in indexer.get_objects():
        base, diacritics = normalize_char_separate_diacritics(original)
        if original in CHARS_THAT_CAN_BE_DECORATED_WITH_AN_ELISION_TILDE:
            m[indexer.get_index(original)] = indexer.get_index(add_tilde(base))
        elif base in LETTERS_WITH_DISREGARDEDABLE_DIACRITICS:
            for d in diacritics:
                if d in COMBINING_DIACRITICS_THAT_CAN_BE_DISREGARDED:
                    m[indexer.get_index(original)] = indexer.get_index(add_tilde(base))
                    break
    return m


def make_ligature_map(indexer: CharIndexer) -> Dict[int, List[int]]:
    m: Dict[int, List[int]] = {}
    for lig, expansion in LIGATURES.items():
        chars = read_normalize_characters(lig)
        if len(chars) > 1:
            raise ValueError("Ligature [%s] has more than one character" % lig)
        m[indexer.get_index(chars[0])] = [
            indexer.get_index(c) for c in read_normalize_characters(expansion)
        ]
    return m


def make_diacritic_disregard_map(indexer: CharIndexer) -> Dict[int, int]:
    m: Dict[int, int] = {}
    for original in indexer.get_objects():
        base, diacritics = normalize_char_separate_diacritics(original)
        if base in LETTERS_WITH_DISREGARDEDABLE_DIACRITICS:
            for d in diacritics:
                if d in COMBINING_DIACRITICS_THAT_CAN_BE_DISREGARDED:
                    m[indexer.get_index(original)] = indexer.get_index(base)
                    break
    return m
