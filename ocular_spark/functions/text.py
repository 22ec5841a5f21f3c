"""Unicode text normalization for web-scale corpus curation.

Every large-corpus pipeline normalizes text before dedup/tokenization
(CCNet, Gopher, Dolma all NFC- or NFKC-normalize and canonicalize
whitespace): byte-identical logical text must hash identically, or
exact dedup silently misses pairs that differ only by a combining
character or an NBSP.

Stages (order matters and is shared verbatim by both engines):
  1. NFC canonical composition — the ONLY Python step (Spark has no
     Unicode-normalization builtin; CPython's `unicodedata` is the
     C-accelerated reference implementation).  Runs as an
     Arrow-batched pandas UDF, never per-row Python in the plan.
  2. Unicode space folding — translate() maps NBSP / ogham / en-quad
     .. hair-space / NNBSP / math-space / ideographic space / TAB to
     ASCII space, one JVM char-map pass.
  3. Zero-width strip (ZWSP/ZWNJ/ZWJ/word-joiner/BOM) — JVM regex.
  4. Control strip (C0 except \\n — TAB is already folded by 2 —
     plus DEL and C1) — JVM regex; \\r dies here so CRLF becomes \\n.
  5. Space-run collapse + trim — JVM regex.

The DuckDB oracle mirrors stages 2-5 string-for-string and uses
nfc_normalize() — an independent NFC implementation — for stage 1: a
genuine two-implementation gate on the Unicode data tables themselves
(tests/test_text_normalize.py probes the agreement directly).

100 TB notes: stages 2-5 are pure map-side whole-stage-codegen
projections; stage 1 is one Arrow batch exchange per task (the same
cost class as the DOM-walk kernel in functions/html.py).  No shuffle
anywhere.  All constants below use \\u escapes in source — invisible
literals do not survive code review or diff tooling.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
                     # under `from __future__ import annotations`

# stage 2: one-to-one char fold (translate source -> all spaces):
# NBSP, ogham, en-quad..hair-space (U+2000-200A), NNBSP, math space,
# ideographic space, TAB
UNICODE_SPACES = (
    "\u00a0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u202f\u205f\u3000\t"
)
_SPACES_TO = " " * len(UNICODE_SPACES)

# stage 3: zero-width & joiners (ZWSP ZWNJ ZWJ word-joiner BOM) as
# literal chars in a character class: identical in Java regex and RE2
ZERO_WIDTH_PAT = "[\u200b\u200c\u200d\u2060\ufeff]"

# stage 4: C0 minus \n (\t already folded by stage 2), DEL, C1.
# \xNN escapes parse identically in Java regex and RE2.
CONTROL_PAT = "[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f]"

SPACE_RUN_PAT = " {2,}"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def normalize_col(col):
    """Stages 2-5 as one Spark Column chain over an NFC'd column.
    Patterns are passed as Column literals, NOT through F.expr — a
    Spark SQL string literal eats single backslashes, which would
    turn CONTROL_PAT's \\x escapes into a letter-matching class."""
    from pyspark.sql import functions as F

    s = F.translate(col, UNICODE_SPACES, _SPACES_TO)
    s = F.regexp_replace(s, F.lit(ZERO_WIDTH_PAT), F.lit(""))
    s = F.regexp_replace(s, F.lit(CONTROL_PAT), F.lit(""))
    s = F.regexp_replace(s, F.lit(SPACE_RUN_PAT), F.lit(" "))
    return F.trim(s)


def normalize_expr_duckdb(col: str) -> str:
    """The SAME stages 2-5 over DuckDB's nfc_normalize(col).  DuckDB
    regexp_replace needs the 'g' flag (first-match-only by default;
    Spark replaces all matches)."""
    return (
        f"trim(regexp_replace(regexp_replace(regexp_replace("
        f"translate(nfc_normalize({col}), {_sql_quote(UNICODE_SPACES)}, {_sql_quote(_SPACES_TO)}), "
        f"{_sql_quote(ZERO_WIDTH_PAT)}, '', 'g'), "
        f"{_sql_quote(CONTROL_PAT)}, '', 'g'), "
        f"{_sql_quote(SPACE_RUN_PAT)}, ' ', 'g'))"
    )


def nfc_kernel():
    """Arrow-batched NFC pandas UDF (stage 1)."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return nfc


# ---------------------------------------------------------------- fixture
# Deterministic non-ASCII decorations for the driver gate (the
# documents fixture is ASCII; the same doc_id -> decoration rule is
# mirrored in the DuckDB oracle).  Every stage is exercised: NFC
# composition (latin combining marks, hangul jamo), space folding,
# zero-width/BOM strip, C0/C1/CRLF strip, run collapse, edge trim.
NORM_DECOR = (
    " cafe\u0301 u\u0308ber",  # NFC: e+comb-acute, u+diaeresis
    " \ufeffA\u030angstro\u0308m\u200bs ",  # BOM + comb-ring + comb-diaeresis + ZWSP + edge spaces
    " \u1100\u1161\u11a8 word",  # hangul jamo -> syllable
    "\tmulti\t\tspace\u00a0 run\u2009x\u3000y",  # TAB runs + NBSP + thin space + ideographic space
    " ctrl\u0001\u0002chars\u001f.\u0085\r\nnext",  # C0 + C1(NEL) + CRLF
    "",  # untouched document
)


def injected_expr(text_col: str = "text", id_col: str = "doc_id") -> str:
    """doc_id -> decorated text; the same SQL parses in Spark and
    DuckDB (CASE/||/quoted literals only)."""
    arms = " ".join(
        f"WHEN {i} THEN {text_col} || {_sql_quote(d)}"
        for i, d in enumerate(NORM_DECOR[:-1])
    )
    return f"CASE {id_col} % {len(NORM_DECOR)} {arms} ELSE {text_col} END"
