"""Deterministic fixture synthesis for the interleaved-spans pipeline.

Implements FIXTURES.md: the `docs` / `media` tables are derived
deterministically from the driver-provided ``documents.parquet``
(TESTDATA.md) — every draw is a function of ``hash(doc_id)``, no RNG
state (FIXTURES.md §8).  Page images are rendered from the fixture
font itself (glyphs.py), so expected decodes are known by
construction; media-span gold text is produced by the in-process
oracle decoder (the same NumPy code path the Spark kernel runs).

No external data: everything derives from /root/testdata parquet +
procedural glyphs.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from ocular_spark.charset import SPACE, CharIndexer
from ocular_spark.font import LINE_HEIGHT, WHITE, BLACK, Font
from ocular_spark.glyphs import build_init_font, render_glyph
from ocular_spark.lm import KNESER_NEY, NgramLanguageModel, build_ngram_lm_from_chars
from ocular_spark.pipeline import ModelBundle, pack_line

CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")


def _h(s: str, salt: str = "") -> int:
    return int.from_bytes(hashlib.sha256((salt + "|" + s).encode()).digest()[:8], "big")


def render_text_line(
    text: str, margin: int = 4, char_width: int = 10, space_width: int = 6, pad: int = 2
) -> np.ndarray:
    """Compose one page line from fixture glyphs (cols = first axis)."""
    cols = [np.full((margin, LINE_HEIGHT), WHITE, dtype=np.uint8)]
    for ch in text:
        if ch == " ":
            cols.append(np.full((space_width, LINE_HEIGHT), WHITE, dtype=np.uint8))
        else:
            cols.append(render_glyph(ch, target_width=char_width))
            cols.append(np.full((pad, LINE_HEIGHT), WHITE, dtype=np.uint8))
    cols.append(np.full((margin, LINE_HEIGHT), WHITE, dtype=np.uint8))
    return np.concatenate(cols, axis=0)


def add_noise(img: np.ndarray, p: float, key: int) -> np.ndarray:
    """Deterministic salt-and-pepper noise: flip pixel (i,j) iff a hash
    of (key, i, j) falls below p (no RNG stream — corpus-resize stable)."""
    if p <= 0:
        return img
    rng = np.random.RandomState(key % (2**32))
    flip = rng.rand(*img.shape) < p
    out = img.copy()
    out[flip] = np.where(out[flip] == WHITE, BLACK, WHITE).astype(np.uint8)
    return out


def _wrap_words(words: List[str], max_chars: int = 18) -> List[str]:
    lines: List[str] = []
    cur = ""
    for w in words:
        if not cur:
            cur = w
        elif len(cur) + 1 + len(w) <= max_chars:
            cur += " " + w
        else:
            lines.append(cur)
            cur = w
    if cur:
        lines.append(cur)
    return lines


def page_counts_for_doc(doc_id: str) -> int:
    """Heavy-tail page-count distribution (FIXTURES.md §1): 90% of docs
    have 1 media span, 9% have 8, 1% have 40."""
    r = _h(doc_id, "pages") % 100
    if r < 90:
        return 1
    if r < 99:
        return 8
    return 40


def derive_docs_and_media(
    documents: pd.DataFrame,
    n_docs: Optional[int] = None,
    media_frac_words: int = 6,
    noise_levels: Tuple[float, ...] = (0.0, 0.02, 0.05),
    heavy_tail: bool = False,
    max_pages_per_doc: int = 3,
    lines_per_page: int = 2,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Derive interleaved docs + media tables from the documents table.

    Each doc's word stream is chunked into alternating text spans and
    rendered media spans (page images).  Returns
      docs:  (doc_id, spans[(kind, text, media_ref, offset)])
             -- media spans carry text=None (to be decoded)
      media: (media_ref, n_lines, lines[binary], src_text, noise)
             -- src_text retained for test goldens only.
    """
    docs_rows = []
    media_rows = []
    it = documents.itertuples()
    count = 0
    for row in it:
        if n_docs is not None and count >= n_docs:
            break
        count += 1
        doc_id = "doc-%06d" % int(row.doc_id)
        words = str(row.text).split()
        n_pages = page_counts_for_doc(doc_id) if heavy_tail else (
            1 + _h(doc_id, "np") % max_pages_per_doc
        )
        spans = []
        offset = 0
        wi = 0
        page_idx = 0
        while page_idx < n_pages:
            # a text span (possibly empty -> skipped)
            n_text_words = 2 + _h(doc_id, "tw%d" % offset) % 5
            if wi < len(words) and (_h(doc_id, "t%d" % offset) % 4) != 0:
                chunk = words[wi : wi + n_text_words]
                wi += len(chunk)
                if chunk:
                    spans.append(("text", " ".join(chunk), None, offset))
                    offset += 1
            # a media span
            chunk = words[wi : wi + media_frac_words]
            if not chunk:
                wi = 0
                chunk = words[:media_frac_words]
            wi += len(chunk)
            media_ref = "m-%s-%02d" % (doc_id, page_idx)
            noise = noise_levels[_h(media_ref, "n") % len(noise_levels)]
            src_lines = _wrap_words(chunk)[:lines_per_page]
            imgs = [
                add_noise(render_text_line(l), noise, _h(media_ref, "px%d" % k))
                for k, l in enumerate(src_lines)
            ]
            media_rows.append(
                {
                    "media_ref": media_ref,
                    "n_lines": len(imgs),
                    "lines": [pack_line(im) for im in imgs],
                    "src_text": "\n".join(src_lines),
                    "noise": noise,
                }
            )
            spans.append(("media", None, media_ref, offset))
            offset += 1
            page_idx += 1
        docs_rows.append(
            {
                "doc_id": doc_id,
                "spans": [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for k, t, m, o in spans
                ],
            }
        )
    return pd.DataFrame(docs_rows), pd.DataFrame(media_rows)


def media_lines_to_page_pngs(media: pd.DataFrame, skew: bool = False) -> pd.DataFrame:
    """Convert pre-extracted-line media rows into whole-page PNGs
    (media_ref, n_lines, page_png) exercising the full preprocessing
    chain: lines stacked with inter-line gaps and margins, optional
    deterministic ±0.02 rad skew (FIXTURES.md §2)."""
    from ocular_spark.functions.png import encode_gray_png
    from ocular_spark.pipeline import unpack_line
    from ocular_spark.preprocess import BOT_DIST, TOP_DIST, rotate_levels

    band = TOP_DIST + BOT_DIST  # 40: the extractor's fixed slice height
    rows = []
    for r in media.itertuples():
        lines = [unpack_line(raw) for raw in r.lines]
        wmax = max(l.shape[0] for l in lines) + 8
        gap = 14
        cols = [np.full((wmax, gap), 255.0)]
        for l in lines:
            # upsample the 30-row line to the 40-row band height so the
            # extractor's [base-29, base+11) slice + resample-to-30
            # round-trips back to font scale (nearest-neighbor)
            yi = np.minimum((np.arange(band) * LINE_HEIGHT) // band, LINE_HEIGHT - 1)
            up = l[:, yi]  # (T, 40)
            blk = np.full((wmax, band), 255.0)
            blk[4 : 4 + l.shape[0]] = np.where(up == 1, 0.0, 255.0)
            cols.append(blk)
            cols.append(np.full((wmax, gap), 255.0))
        page = np.concatenate(cols, axis=1)  # (width, height)
        if skew:
            angle = ((_h(r.media_ref, "skew") % 9) - 4) * 0.005  # -0.02..0.02
            page = rotate_levels(page, angle)
        png = encode_gray_png(page.T.astype(np.uint8))  # PNG rows = y
        rows.append(
            {"media_ref": r.media_ref, "n_lines": len(lines), "page_png": png}
        )
    return pd.DataFrame(rows)


def add_page_margins(
    png_bytes: bytes,
    margin_ratio: float = 0.14,
    dark_band: int = 6,
    dark_level: int = 30,
) -> bytes:
    """Wrap a page PNG in book-scan margins: ~margin_ratio white border
    per side (content stays above the cropper's 60% center-segment
    minimum) plus a dark scan-edge band at the outer rim — the exact
    artifact Cropper.java (:254-273) exists to remove.  With crop OFF
    the bands are extracted and decoded as characters; with crop ON
    the clean-page tokens come back (tests/test_preprocess.py,
    driver row transcribe_spans_crop)."""
    import numpy as np

    from ocular_spark.functions.png import decode_gray_png, encode_gray_png

    img = decode_gray_png(bytes(png_bytes))  # (H, W), rows = y
    h, w = img.shape
    # cap total per-side margin (white + band) at 30% of the dimension
    # so content stays >= ~62% of each axis — above the cropper's 60%
    # center-segment minimum even for small pages
    mh = max(0, min(int(margin_ratio * h) + 8, int(0.30 * h) - dark_band))
    mw = max(0, min(int(margin_ratio * w) + 8, int(0.30 * w) - dark_band))
    out = np.full((h + 2 * (mh + dark_band), w + 2 * (mw + dark_band)), 255, np.uint8)
    out[:dark_band, :] = dark_level
    out[-dark_band:, :] = dark_level
    out[:, :dark_band] = dark_level
    out[:, -dark_band:] = dark_level
    out[mh + dark_band : mh + dark_band + h, mw + dark_band : mw + dark_band + w] = img
    return encode_gray_png(out)


def derive_docs_and_media_crop(
    documents: pd.DataFrame, n_docs: int = 2
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Crop-variant fixture (O4 on the Spark path): whole-page PNGs
    with book-scan margins + dark edge bands; media carries page_png,
    so transcribe() runs the full preprocessing chain per page."""
    docs, media = derive_docs_and_media(
        documents, n_docs=n_docs, max_pages_per_doc=1, noise_levels=(0.0,)
    )
    pages = media_lines_to_page_pngs(media, skew=False)
    pages["page_png"] = pages["page_png"].map(add_page_margins)
    return docs, pages


def build_models_crop(documents: pd.DataFrame) -> Tuple[ModelBundle, List[str]]:
    """Models for the crop driver query: same LM/font as the flagship,
    but a bundle with preprocess_crop=True (Cropper ON) and reduced
    line-extraction restarts (the margin pages are clean, 20 restarts
    converge; 100 would quintuple the query's preprocessing cost)."""
    base, char_strs = build_models(documents)
    bundle = ModelBundle(
        base.font_bytes,
        base.lm,
        beam_size=10,
        preprocess_em_restarts=20,
        preprocess_crop=True,
        transition_model=base.transition_model,
    )
    return bundle, char_strs


def build_models(
    documents: pd.DataFrame,
    order: int = 3,
    max_docs_for_lm: int = 100,
    beam_size: int = 10,
    cache_key: Optional[str] = None,
) -> Tuple[ModelBundle, List[str]]:
    """Build (or load cached) fixture models: char LM from the
    documents text + font initialized from procedural glyphs
    (InitializeLanguageModel / InitializeFont equivalents)."""
    texts = [str(t) for t in documents["text"].head(max_docs_for_lm)]
    if cache_key is None:
        m = hashlib.sha256()
        for t in texts:
            m.update(t.encode())
        m.update(b"|order=%d|glyphv3" % order)
        cache_key = m.hexdigest()[:16]
    cache_path = os.path.join(CACHE_DIR, "models_%s.pkl" % cache_key)
    if os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            font_bytes, lm, tm = pickle.load(f)
    else:
        from ocular_spark.decoder import CompiledTransitionModel

        ci = CharIndexer()
        corpus = [list(t) for t in texts]
        # force hyphen (universal punctuation) into the charset,
        # InitializeLanguageModel.java:272-274
        corpus.append(list("-"))
        lm = build_ngram_lm_from_chars(corpus, order, KNESER_NEY, 1.0, ci)
        font = build_init_font(ci.get_objects())
        font_bytes = font.to_bytes()
        # compile the dense transition tables ONCE on the driver; the
        # broadcast then ships plain NumPy arrays (cold workers skip
        # the O(n_ctx * C) compile entirely)
        tm = CompiledTransitionModel(lm)
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((font_bytes, lm, tm), f)
        os.replace(tmp, cache_path)
    char_strs = lm.get_character_indexer().get_objects()
    bundle = ModelBundle(font_bytes, lm, beam_size=beam_size, transition_model=tm)
    return bundle, char_strs


def oracle_transcribe_pandas(
    docs: pd.DataFrame, media: pd.DataFrame, bundle: ModelBundle, char_strs: List[str]
) -> pd.DataFrame:
    """Single-process oracle: same kernels, no Spark.  Returns the
    docs-shaped output the pipeline must match span-for-span.
    Media may carry pre-extracted ``lines`` or a whole-page
    ``page_png`` (run through the same prepare_page chain with the
    bundle's straighten/crop flags, mirroring decode_pages_kernel)."""
    from ocular_spark.pipeline import get_decoder, unpack_line
    from ocular_spark.transcriptions import diplomatic_text

    decoder = get_decoder(bundle)
    use_lines = "lines" in media.columns
    media_by_ref: Dict[str, object] = {
        r.media_ref: (list(r.lines) if use_lines else r.page_png)
        for r in media.itertuples()
    }

    def _page_imgs(payload):
        if use_lines:
            return [unpack_line(raw) for raw in payload]
        import numpy as np

        from ocular_spark.functions.png import decode_gray_png
        from ocular_spark.preprocess import prepare_page

        page = decode_gray_png(bytes(payload)).T.astype(np.float64)
        return prepare_page(
            page,
            binarize_threshold=bundle.binarize_threshold,
            do_straighten=bundle.preprocess_straighten,
            do_crop=bundle.preprocess_crop,
            num_em_iters=bundle.preprocess_em_iters,
            num_em_restarts=bundle.preprocess_em_restarts,
        )

    out_rows = []
    for r in docs.itertuples():
        spans = []
        for s in r.spans:
            if s["kind"] == "media":
                imgs = _page_imgs(media_by_ref[s["media_ref"]])
                decodes, _ = decoder.decode_document(imgs)
                text = diplomatic_text(decodes, char_strs)
                spans.append(
                    {"kind": "media", "text": text, "media_ref": s["media_ref"],
                     "offset": s["offset"]}
                )
            else:
                spans.append(dict(s))
        spans.sort(key=lambda s: s["offset"])
        out_rows.append({"doc_id": r.doc_id, "spans": spans})
    out = pd.DataFrame(out_rows)
    return out.sort_values("doc_id").reset_index(drop=True)


def reverse_words(text: str) -> str:
    return " ".join(w[::-1] for w in str(text).split())


def build_models_cs(
    documents: pd.DataFrame,
    order: int = 3,
    max_docs_for_lm: int = 100,
    beam_size: int = 20,
) -> Tuple[ModelBundle, List[str]]:
    """Bilingual code-switch + glyph-substitution fixture models
    (serving-path analog of main/FonttrainTranscribeShared.java:255-304
    wiring a CodeSwitchTransitionModel + GSM by option).

    Language 0 is the documents text; language 1 is its deterministic
    word-reversed variant (disjoint n-gram statistics, same charset).
    The GSM is the uniform factory model with substitution enabled, so
    long-s glyphs decode as 's' in the normalized channel.  The
    transition model ships PREBUILT in the bundle (lazy tables, cheap
    init, picklable)."""
    import hashlib as _hl

    from ocular_spark.cstransition import CodeSwitchTransitionModel
    from ocular_spark.gsm import BasicGlyphSubstitutionModelFactory
    from ocular_spark.lm import (
        BasicCodeSwitchLanguageModel,
        CorpusCounter,
        add_auxiliary_glyph_chars,
    )

    texts = [str(t) for t in documents["text"].head(max_docs_for_lm)]
    m = _hl.sha256()
    for t in texts:
        m.update(t.encode())
    m.update(b"|order=%d|csv1" % order)
    cache_path = os.path.join(CACHE_DIR, "models_cs_%s.pkl" % m.hexdigest()[:16])
    if os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            font_bytes, cslm, tm = pickle.load(f)
    else:
        ci = CharIndexer()
        corpora = [
            [list(t) for t in texts],
            [list(reverse_words(t)) for t in texts],
        ]
        counters, actives = [], []
        for corpus in corpora:
            counter = CorpusCounter(max(order, 2))
            for i, line in enumerate(corpus):
                counter.count_line_chars(line, ci, i)
            counters.append(counter)
            actives.append(set(counter.active_characters) | {ci.get_index(SPACE)})
        ci.get_index("-")
        add_auxiliary_glyph_chars(ci)
        ci.lock()
        lms = [
            NgramLanguageModel(ci, counters[k].counts, actives[k], KNESER_NEY, 1.0)
            for k in range(2)
        ]
        cslm = BasicCodeSwitchLanguageModel(
            [(lms[0], 0.6), (lms[1], 0.4)], ci, ["english", "reversed"], 0.999999
        )
        gsm_factory = BasicGlyphSubstitutionModelFactory(
            1.0, 100.0, ["english", "reversed"], ci, actives, gsm_power=1.0
        )
        gsm = gsm_factory.uniform()
        tm = CodeSwitchTransitionModel(
            cslm, True, gsm, allow_glyph_substitution=True, no_char_sub_prior=0.9
        )
        font = build_init_font(ci.get_objects())
        font_bytes = font.to_bytes()
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((font_bytes, cslm, tm), f)
        os.replace(tmp, cache_path)
    bundle = ModelBundle(
        font_bytes, cslm, beam_size=beam_size, transition_model=tm
    )
    return bundle, cslm.get_character_indexer().get_objects()


def derive_docs_and_media_cs(
    documents: pd.DataFrame, n_docs: int = 3, words_per_line: int = 3
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Interleaved docs whose pages code-switch per line: line 0 is
    language-0 words from the doc text, line 1 their word-reversed
    language-1 counterparts.  The first page's line 0 renders one 's'
    as a LONG-S glyph (the classic historical-print substitution), so
    the decode exercises the GSM path end-to-end."""
    docs_rows, media_rows = [], []
    count = 0
    long_s_used = False
    for row in documents.itertuples():
        if count >= n_docs:
            break
        words = [w for w in str(row.text).split() if w][: 2 * words_per_line]
        if len(words) < 2 * words_per_line:
            continue
        doc_id = "csdoc-%06d" % int(row.doc_id)
        line0 = " ".join(words[:words_per_line])
        line1 = reverse_words(" ".join(words[words_per_line:]))
        render0 = line0
        if not long_s_used and "s" in line0:
            i = line0.index("s")
            render0 = line0[:i] + "ſ" + line0[i + 1 :]  # long s
            long_s_used = True
        media_ref = "m-%s-00" % doc_id
        imgs = [render_text_line(render0), render_text_line(line1)]
        media_rows.append(
            {
                "media_ref": media_ref,
                "n_lines": len(imgs),
                "lines": [pack_line(im) for im in imgs],
                "src_text": line0 + "\n" + line1,
                "noise": 0.0,
            }
        )
        docs_rows.append(
            {
                "doc_id": doc_id,
                "spans": [
                    {"kind": "text", "text": " ".join(words[:2]), "media_ref": None,
                     "offset": 0},
                    {"kind": "media", "text": None, "media_ref": media_ref,
                     "offset": 1},
                ],
            }
        )
        count += 1
    return pd.DataFrame(docs_rows), pd.DataFrame(media_rows)


def build_models_offset(
    documents: pd.DataFrame, beam_size: int = 20
) -> Tuple[ModelBundle, List[str]]:
    """Markov-offset decode variant models: the monolingual fixture LM
    with a MarkovOffsetTransitionModel (states carry explicit vertical
    offsets; emission cache indexed per offset —
    CharacterNgramTransitionModelMarkovOffset.java /
    CachingEmissionModelExplicitOffset.java)."""
    from ocular_spark.markov_offset import MarkovOffsetTransitionModel

    base, char_strs = build_models(documents, beam_size=beam_size)
    tm = MarkovOffsetTransitionModel(base.lm)
    bundle = ModelBundle(
        base.font_bytes, base.lm, beam_size=beam_size, transition_model=tm
    )
    return bundle, char_strs


def shift_line_vertical(img: np.ndarray, shift: int) -> np.ndarray:
    """Shift a (width, LINE_HEIGHT) line image down by `shift` rows
    (negative = up), padding with WHITE."""
    out = np.full_like(img, WHITE)
    if shift > 0:
        out[:, shift:] = img[:, :-shift]
    elif shift < 0:
        out[:, :shift] = img[:, -shift:]
    else:
        out[:] = img
    return out


def derive_docs_and_media_offset(
    documents: pd.DataFrame, n_docs: int = 4, words_per_line: int = 3
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Docs whose page lines are vertically shifted by a deterministic
    per-line offset in [-3, 3] — decodable cleanly only by the
    explicit-offset variant tracking the shift."""
    docs_rows, media_rows = [], []
    count = 0
    for row in documents.itertuples():
        if count >= n_docs:
            break
        words = [w for w in str(row.text).split() if w][: 2 * words_per_line]
        if len(words) < 2 * words_per_line:
            continue
        doc_id = "offdoc-%06d" % int(row.doc_id)
        media_ref = "m-%s-00" % doc_id
        lines = [
            " ".join(words[:words_per_line]),
            " ".join(words[words_per_line:]),
        ]
        imgs = []
        for k, l in enumerate(lines):
            shift = (_h(media_ref, "shift%d" % k) % 7) - 3
            imgs.append(shift_line_vertical(render_text_line(l), shift))
        media_rows.append(
            {
                "media_ref": media_ref,
                "n_lines": len(imgs),
                "lines": [pack_line(im) for im in imgs],
                "src_text": "\n".join(lines),
                "noise": 0.0,
            }
        )
        docs_rows.append(
            {
                "doc_id": doc_id,
                "spans": [
                    {"kind": "media", "text": None, "media_ref": media_ref,
                     "offset": 0},
                    {"kind": "text", "text": " ".join(words[:2]), "media_ref": None,
                     "offset": 1},
                ],
            }
        )
        count += 1
    return pd.DataFrame(docs_rows), pd.DataFrame(media_rows)
