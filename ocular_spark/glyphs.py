"""Deterministic procedural glyph bitmaps.

Replaces the reference's AWT system-font enumeration
(``image/FontRenderer.java``, ``main/InitializeFont.java:69-99``) with
a reproducible glyph source: a classic public-domain 5x7 dot-matrix
style table for common chars, and a hash-derived (but deterministic)
pattern for anything else.  Parity does not require matching AWT
rendering — decode parity is measured against a font's own rendered
pages (FIXTURES.md §5: pages are composed from these same bitmaps).

Each char yields several exposure/width variants (the reference
renders one image per system font; we render ``n_variants``
deterministic perturbations) at LINE_HEIGHT=30.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence

import numpy as np

from ocular_spark.charset import SPACE
from ocular_spark.font import BLACK, LINE_HEIGHT, WHITE

# 5x7 bitmaps, rows top->bottom, 5-bit ints (MSB = leftmost pixel).
_FONT_5X7: Dict[str, Sequence[int]] = {
    "a": (0b00000, 0b00000, 0b01110, 0b00001, 0b01111, 0b10001, 0b01111),
    "b": (0b10000, 0b10000, 0b11110, 0b10001, 0b10001, 0b10001, 0b11110),
    "c": (0b00000, 0b00000, 0b01110, 0b10000, 0b10000, 0b10001, 0b01110),
    "d": (0b00001, 0b00001, 0b01111, 0b10001, 0b10001, 0b10001, 0b01111),
    "e": (0b00000, 0b00000, 0b01110, 0b10001, 0b11111, 0b10000, 0b01110),
    "f": (0b00110, 0b01001, 0b01000, 0b11100, 0b01000, 0b01000, 0b01000),
    "g": (0b00000, 0b01111, 0b10001, 0b10001, 0b01111, 0b00001, 0b01110),
    "h": (0b10000, 0b10000, 0b11110, 0b10001, 0b10001, 0b10001, 0b10001),
    "i": (0b00100, 0b00000, 0b01100, 0b00100, 0b00100, 0b00100, 0b01110),
    "j": (0b00010, 0b00000, 0b00110, 0b00010, 0b00010, 0b10010, 0b01100),
    "k": (0b10000, 0b10000, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010),
    "l": (0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "m": (0b00000, 0b00000, 0b11010, 0b10101, 0b10101, 0b10101, 0b10101),
    "n": (0b00000, 0b00000, 0b11110, 0b10001, 0b10001, 0b10001, 0b10001),
    "o": (0b00000, 0b00000, 0b01110, 0b10001, 0b10001, 0b10001, 0b01110),
    "p": (0b00000, 0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000),
    "q": (0b00000, 0b01111, 0b10001, 0b10001, 0b01111, 0b00001, 0b00001),
    "r": (0b00000, 0b00000, 0b10110, 0b11001, 0b10000, 0b10000, 0b10000),
    "s": (0b00000, 0b00000, 0b01111, 0b10000, 0b01110, 0b00001, 0b11110),
    "t": (0b01000, 0b01000, 0b11100, 0b01000, 0b01000, 0b01001, 0b00110),
    "u": (0b00000, 0b00000, 0b10001, 0b10001, 0b10001, 0b10011, 0b01101),
    "v": (0b00000, 0b00000, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "w": (0b00000, 0b00000, 0b10101, 0b10101, 0b10101, 0b10101, 0b01010),
    "x": (0b00000, 0b00000, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001),
    "y": (0b00000, 0b10001, 0b10001, 0b01111, 0b00001, 0b10001, 0b01110),
    "z": (0b00000, 0b00000, 0b11111, 0b00010, 0b00100, 0b01000, 0b11111),
    ".": (0b00000, 0b00000, 0b00000, 0b00000, 0b00000, 0b01100, 0b01100),
    ",": (0b00000, 0b00000, 0b00000, 0b00000, 0b00110, 0b00100, 0b01000),
    "-": (0b00000, 0b00000, 0b00000, 0b11111, 0b00000, 0b00000, 0b00000),
    "'": (0b00110, 0b00100, 0b01000, 0b00000, 0b00000, 0b00000, 0b00000),
    '"': (0b01010, 0b01010, 0b01010, 0b00000, 0b00000, 0b00000, 0b00000),
    "&": (0b01100, 0b10010, 0b10100, 0b01000, 0b10101, 0b10010, 0b01101),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    "ſ": (0b00110, 0b01001, 0b01000, 0b01000, 0b01000, 0b01000, 0b01000),
}


def _bitmap_5x7(char: str) -> np.ndarray:
    """(7, 5) bool bitmap; unknown chars get a deterministic hash glyph."""
    base = char[0] if char else "?"
    rows = _FONT_5X7.get(base)
    if rows is None:
        digest = hashlib.sha256(char.encode("utf-8")).digest()
        bits = np.unpackbits(np.frombuffer(digest[:8], dtype=np.uint8))
        grid = bits[:35].reshape(7, 5).astype(bool)
        grid[0, :] = False  # keep a white border row for realism
        if not grid.any():
            grid[3, 2] = True
        return grid
    grid = np.zeros((7, 5), dtype=bool)
    for r, bits in enumerate(rows):
        for cidx in range(5):
            grid[r, cidx] = bool((bits >> (4 - cidx)) & 1)
    # combining diacritics on the base letter: add a mark in the top row
    if len(char) > 1:
        grid[0, 1:4] = True
    return grid


def render_glyph(char: str, target_width: int = 10, ascent_rows: int = 17) -> np.ndarray:
    """Render ``char`` as (width, LINE_HEIGHT) pixel array in {WHITE, BLACK}.

    The 5x7 grid is nearest-neighbor upscaled into rows 1..21 of the
    30-row line, putting the baseline at row ~22 = LINE_HEIGHT*29/40 —
    exactly where the line extractor's fixed band (topDist=29,
    botDist=11, LineExtractor.java:28-29) places baselines after
    resampling, so extracted lines match font scale.  Returned array
    is indexed [column][row] like the reference's
    ``PixelType[width][LINE_HEIGHT]``.
    """
    if char == SPACE:
        return np.full((target_width, LINE_HEIGHT), WHITE, dtype=np.uint8)
    grid = _bitmap_5x7(char)  # (7 rows, 5 cols)
    glyph_h = 21  # 7 rows * 3
    # nearest-neighbor resample: every source column covers the full target
    col_idx = np.minimum((np.arange(target_width) * 5) // target_width, 4)
    row_idx = np.repeat(np.arange(7), 3)
    up = grid[np.ix_(row_idx, col_idx)]
    img = np.full((LINE_HEIGHT, target_width), WHITE, dtype=np.uint8)
    top = ascent_rows - glyph_h + 5  # place within the central band
    img[top : top + glyph_h, :] = np.where(up, BLACK, WHITE)
    return img.T.copy()  # (width, LINE_HEIGHT)


def glyph_variants(char: str, n_variants: int = 3) -> List[np.ndarray]:
    """Deterministic pseudo-font variants (stand-in for multiple system
    fonts): widths 8/10/12 with slight vertical jitter derived from the
    char hash — NOT random (FIXTURES.md §8 determinism)."""
    h = int.from_bytes(hashlib.sha256(char.encode("utf-8")).digest()[:4], "big")
    out = []
    for v in range(n_variants):
        width = (8, 10, 12)[v % 3]
        img = render_glyph(char, target_width=width)
        shift = ((h >> v) % 3) - 1  # -1, 0, or 1 row
        if shift and char != SPACE:
            img = np.roll(img, shift, axis=1)
            if shift > 0:
                img[:, :shift] = WHITE
            else:
                img[:, shift:] = WHITE
        out.append(img.astype(np.uint8))
    return out


def build_init_font(characters: Sequence[str], space_width_range=(2, 8)):
    """InitializeFont.run equivalent (main/InitializeFont.java:69-99):
    one template per char, initialized + prior-set from glyph data."""
    from ocular_spark.font import CharacterTemplate, Font

    templates: Dict[str, CharacterTemplate] = {}
    for c in characters:
        if c == SPACE:
            t = CharacterTemplate(SPACE, 1.0, 0.0)
        else:
            t = CharacterTemplate(c, 1.0, 0.0)
            t.initialize_and_set_prior_from_font_data(glyph_variants(c))
        templates[c] = t
    return Font(templates)
