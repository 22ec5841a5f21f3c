"""Composable text readers: raw line -> list of normalized characters.

Re-expresses the reference's decorator chain
(``data/textreader/*.java``; composed in
``main/InitializeLanguageModel.java:215-220``):

    BasicTextReader -> Blacklist -> [Whitelist] -> [RemoveAllDiacritics]
      -> [ConvertLongS] -> [ReplaceSome]

Readers are plain callables over one line, used three ways:
  * driver-side when building models,
  * inside Arrow-batched UDF kernels (``mapInPandas``) for corpus
    normalization — the chain is applied per line of a pandas batch,
    with a vectorized ASCII fast path in :func:`normalize_lines_fast`,
  * in tests (ported reference unit vectors).
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Sequence, Set, Tuple

from ocular_spark import charset
from ocular_spark.charset import (
    LONG_S,
    normalize_char,
    read_normalize_characters,
    remove_any_diacritic_from_char,
)


class TextReader:
    def read_characters(self, line: str) -> List[str]:
        raise NotImplementedError

    def read_characters_lines(self, lines: Iterable[str]) -> List[List[str]]:
        return [self.read_characters(l) for l in lines]


class BasicTextReader(TextReader):
    """data/textreader/BasicTextReader.java"""

    def __init__(self, treat_backslash_as_escape: bool = True) -> None:
        self.treat_backslash_as_escape = treat_backslash_as_escape

    def read_characters(self, line: str) -> List[str]:
        if not self.treat_backslash_as_escape:
            line = line.replace("\\", "\\\\")
        line = line.replace("``", '"').replace("''", '"').replace("\t", "    ")
        return read_normalize_characters(line)

    def __repr__(self) -> str:
        return "BasicTextReader(%s)" % self.treat_backslash_as_escape


class BlacklistCharacterSetTextReader(TextReader):
    """data/textreader/BlacklistCharacterSetTextReader.java"""

    def __init__(self, invalid_characters: Set[str], delegate: TextReader) -> None:
        self.invalid = {normalize_char(c) for c in invalid_characters}
        self.delegate = delegate

    def read_characters(self, line: str) -> List[str]:
        return [c for c in self.delegate.read_characters(line) if c not in self.invalid]


class WhitelistCharacterSetTextReader(TextReader):
    """data/textreader/WhitelistCharacterSetTextReader.java"""

    def __init__(
        self,
        valid_characters: Set[str],
        delegate: TextReader,
        disregard_diacritics: bool = False,
    ) -> None:
        if not valid_characters:
            raise ValueError("validCharacters is empty")
        self.valid = {normalize_char(c) for c in valid_characters}
        self.valid.add(charset.SPACE)
        self.disregard_diacritics = disregard_diacritics
        self.delegate = delegate

    def read_characters(self, line: str) -> List[str]:
        out: List[str] = []
        for c in self.delegate.read_characters(line):
            if c in self.valid:
                out.append(c)
            elif self.disregard_diacritics and remove_any_diacritic_from_char(c) in self.valid:
                out.append(c)
        return out


class RemoveAllDiacriticsTextReader(TextReader):
    """data/textreader/RemoveAllDiacriticsTextReader.java"""

    def __init__(self, delegate: TextReader) -> None:
        self.delegate = delegate

    def read_characters(self, line: str) -> List[str]:
        return [remove_any_diacritic_from_char(c) for c in self.delegate.read_characters(line)]


class ConvertLongSTextReader(TextReader):
    """data/textreader/ConvertLongSTextReader.java:28-45.

    Replace 's' with long-s before an alphabetic character, except a
    terminal 's' and the 's' of an "ſsi" sequence.
    """

    def __init__(self, delegate: TextReader) -> None:
        self.delegate = delegate

    def read_characters(self, line: str) -> List[str]:
        chars = list(self.delegate.read_characters(line))
        for t in range(len(chars) - 1):
            if chars[t] == "s":
                nxt = remove_any_diacritic_from_char(chars[t + 1])
                if len(nxt) != 1 and nxt != "\\\\":
                    raise AssertionError("expected single-codepoint char: [%s]" % nxt)
                nxt_cp = nxt[0]
                if t > 0 and chars[t - 1] == LONG_S and nxt_cp == "i":
                    pass  # "ſsi": keep the short s
                elif nxt_cp.isalpha():
                    chars[t] = LONG_S
        return chars


class ReplaceSomeTextReader(TextReader):
    """data/textreader/ReplaceSomeTextReader.java:32-79.

    Each rule ``(input_seq, output_seq, each)`` replaces every
    ``each``-th occurrence of ``input_seq`` (occurrence counter is
    stateful across lines, matching the reference's instance field).
    Overlapping matches advance the counter without replacing, exactly
    as the reference's sliding iterator does.
    """

    def __init__(
        self,
        rules: Sequence[Tuple[Sequence[str], Sequence[str], int]],
        delegate: TextReader,
    ) -> None:
        self.rules = [(list(i), list(o), int(e)) for i, o, e in rules]
        self.delegate = delegate
        self.occurrences = [0] * len(self.rules)

    def read_characters(self, line: str) -> List[str]:
        result = list(self.delegate.read_characters(line))
        for ri, (inp, out, each) in enumerate(self.rules):
            k = len(inp)
            padded: List[Optional[str]] = list(result) + [None] * (k - 1)
            new_result: List[str] = []
            j = 0
            n = len(result)  # windows start at 0..n-1 (reference pads by k-1)
            while j < n:
                window = padded[j : j + k]
                if window == inp:
                    if self.occurrences[ri] % each == each - 1:
                        new_result.extend(out)
                        self.occurrences[ri] += 1
                        j += k  # consume the whole match
                        continue
                    self.occurrences[ri] += 1
                new_result.append(padded[j])  # type: ignore[arg-type]
                j += 1
            result = new_result
        return result

    @staticmethod
    def load_rules(lines: Iterable[str]) -> List[Tuple[List[str], List[str], int]]:
        """Rule-file format ``input<TAB>output<TAB>each``
        (ReplaceSomeTextReader.java:69-79; e.g. /root/reference/replace/spanish.txt)."""
        rules: List[Tuple[List[str], List[str], int]] = []
        for line in lines:
            if not line.strip():
                continue
            parts = line.split("\t")
            if len(parts) != 3:
                raise ValueError("rule line does not contain 3 parts: %r" % line)
            rules.append(
                (
                    read_normalize_characters(parts[0]),
                    read_normalize_characters(parts[1]),
                    int(parts[2]),
                )
            )
        return rules


class FlipUVTextReader(TextReader):
    """data/textreader/FlipUVTextReader.java: stochastically swap u/v
    (early-modern typography augmentation).  Uses the same fixed-seed
    java.util.Random(0) stream as the reference, so output is
    deterministic and bit-compatible."""

    def __init__(self, flip_rate: float, delegate: TextReader) -> None:
        from ocular_spark.preprocess import JavaRandom

        self.flip_rate = flip_rate
        self.delegate = delegate
        self._rand = JavaRandom(0)

    def read_characters(self, line: str) -> List[str]:
        out: List[str] = []
        for c in self.delegate.read_characters(line):
            if c in ("u", "U", "v", "V"):
                keep = self._rand.next_double() < self.flip_rate
                flip_map = {"u": "v", "U": "V", "v": "u", "V": "U"}
                out.append(c if keep else flip_map[c])
            else:
                out.append(c)
        return out


def build_reader_chain(
    treat_backslash_as_escape: bool = True,
    blacklist: Optional[Set[str]] = None,
    whitelist: Optional[Set[str]] = None,
    whitelist_disregard_diacritics: bool = False,
    remove_diacritics: bool = False,
    convert_long_s: bool = False,
    replace_rules: Optional[Sequence[Tuple[Sequence[str], Sequence[str], int]]] = None,
) -> TextReader:
    """Compose the full decorator chain (InitializeLanguageModel.java:215-220)."""
    reader: TextReader = BasicTextReader(treat_backslash_as_escape)
    reader = BlacklistCharacterSetTextReader(
        blacklist if blacklist is not None else set(charset.BANNED_CHARS), reader
    )
    if whitelist:
        reader = WhitelistCharacterSetTextReader(
            whitelist, reader, whitelist_disregard_diacritics
        )
    if remove_diacritics:
        reader = RemoveAllDiacriticsTextReader(reader)
    if convert_long_s:
        reader = ConvertLongSTextReader(reader)
    if replace_rules:
        reader = ReplaceSomeTextReader(replace_rules, reader)
    return reader


# ---- vectorized fast path for Arrow kernels ----

# Lines matching this need no normalization parse: no escapes, no
# combining marks, no precomposed chars, no `` '' or tabs.
_PLAIN_RE = re.compile(r"^[ -\[\]-~]*$")  # printable ASCII minus backslash


def normalize_lines_fast(lines: Sequence[str], reader: TextReader) -> List[List[str]]:
    """Apply ``reader`` to a batch of lines.

    Plain-ASCII lines (the overwhelming majority of a web-scale text
    corpus) skip the per-codepoint parser: for a BasicTextReader chain
    each ASCII codepoint IS a normalized character, so `list(line)`
    is exact.  Non-ASCII / escaped lines take the exact slow path.
    Stateful readers (ReplaceSome) disable the fast path entirely.
    """
    has_state = _chain_has_state(reader)
    out: List[List[str]] = []
    for line in lines:
        if not has_state and _PLAIN_RE.match(line) and "``" not in line and "''" not in line:
            out.append(_apply_chain_ascii(reader, line))
        else:
            out.append(reader.read_characters(line))
    return out


def _chain_has_state(reader: TextReader) -> bool:
    r: Optional[TextReader] = reader
    while r is not None:
        if isinstance(r, (ReplaceSomeTextReader, FlipUVTextReader)):
            return True
        r = getattr(r, "delegate", None)
    return False


def _apply_chain_ascii(reader: TextReader, line: str) -> List[str]:
    """Exact fast path: for ASCII input every decorator acts codepoint-wise."""
    if isinstance(reader, BasicTextReader):
        return list(line)
    if isinstance(reader, BlacklistCharacterSetTextReader):
        inner = _apply_chain_ascii(reader.delegate, line)
        return [c for c in inner if c not in reader.invalid]
    if isinstance(reader, WhitelistCharacterSetTextReader):
        inner = _apply_chain_ascii(reader.delegate, line)
        return [c for c in inner if c in reader.valid]
    if isinstance(reader, RemoveAllDiacriticsTextReader):
        return _apply_chain_ascii(reader.delegate, line)  # ASCII has no diacritics
    if isinstance(reader, ConvertLongSTextReader):
        chars = _apply_chain_ascii(reader.delegate, line)
        for t in range(len(chars) - 1):
            if chars[t] == "s":
                nxt = chars[t + 1]
                if t > 0 and chars[t - 1] == LONG_S and nxt == "i":
                    pass
                elif nxt.isalpha():
                    chars[t] = LONG_S
        return chars
    return reader.read_characters(line)
