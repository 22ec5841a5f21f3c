"""Page preprocessing: binarize -> straighten -> crop -> extract lines
-> resample to LINE_HEIGHT.

Re-expresses the reference chain (applied per page in
data/LazyRawImageDocument.java:80-92):
  * Binarizer.java:45-79      — global black-percentile threshold
                                 (already-binary passthrough :24-43),
  * Straightener.java:18-51   — grid-search 20 angles in ±0.05 rad
                                 maximizing vertical total variation,
  * Cropper.java:16-131       — 3-segment variance objective over
                                 column/row total-variation profiles,
  * LineExtractor.java:19-75 + VerticalProfile.java + VerticalModel.java
                              — 3-state cyclic semi-Markov HMM
                                 {ASCENDER, BASE, DESCENDER}, sizes
                                 6..30, gaussian emissions/sizes, EM
                                 5 iters x 100 restarts seeded by
                                 java.util.Random(0) (bit-exact LCG
                                 port), Viterbi segmentation, fixed
                                 band topDist=29/botDist=11,
  * ImageUtils.resampleImage  — rescale to line height 30.

Everything is NumPy over a (width, height) `levels` array in 0..255
(axis order matches the reference's double[x][y]).  Runs inside the
Spark decode kernel when media carries whole pages rather than
pre-extracted lines.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from ocular_spark.font import LINE_HEIGHT

MAX_LEVEL = 255.0

ASCENDER, BASE, DESCENDER = 0, 1, 2
MIN_SIZES = np.array([6, 6, 6])
MAX_SIZES = np.array([30, 30, 30])


class JavaRandom:
    """Bit-exact java.util.Random (48-bit LCG; public JDK spec)."""

    def __init__(self, seed: int) -> None:
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) >= 0 and bits - val + (bound - 1) < (1 << 31):
                return val

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) / float(1 << 53)


# ---------------------------------------------------------------- binarize

def is_binary(levels: np.ndarray) -> bool:
    return len(np.unique(levels.astype(np.int64))) <= 2


def binarize_already_binary(levels: np.ndarray) -> np.ndarray:
    threshold = (levels.max() + levels.min()) / 2.0
    return np.where(levels <= threshold, 0.0, MAX_LEVEL)


def binarize_global(black_percentile: float, levels: np.ndarray) -> np.ndarray:
    """Binarizer.binarizeGlobal (:45-79): threshold = smallest gray
    level v with cumulative histogram count >= ceil(total * pct)."""
    if is_binary(levels):
        return binarize_already_binary(levels)
    hist = np.bincount(levels.astype(np.int64).ravel(), minlength=int(MAX_LEVEL) + 1)
    rank = math.ceil(levels.size * black_percentile)
    cum = np.cumsum(hist)
    idx = np.searchsorted(cum, rank, side="left")
    threshold = float(min(idx, int(MAX_LEVEL)))
    return np.where(levels <= threshold, 0.0, MAX_LEVEL)


def binarize_local(
    black_percentile: float, radius_factor: float, levels: np.ndarray
) -> np.ndarray:
    """Binarizer.binarizeLocal (:81-130): per-block percentile
    thresholds over a grid of radius ``levels.shape[0] * radius_factor``
    (each block's threshold computed from its ±radius neighborhood)."""
    if is_binary(levels):
        return binarize_already_binary(levels)
    w, h = levels.shape
    radius = int(w * radius_factor)
    if radius < 1:
        return binarize_global(black_percentile, levels)
    d_w = math.ceil(w / radius)
    d_h = math.ceil(h / radius)
    thresholds = np.zeros((d_w, d_h))
    for di in range(d_w):
        for dj in range(d_h):
            i = di * radius + radius // 2
            j = dj * radius + radius // 2
            if i < w and j < h:
                block = levels[
                    max(0, i - radius) : min(w, i + radius),
                    max(0, j - radius) : min(h, j + radius),
                ]
                hist = np.bincount(block.astype(np.int64).ravel(), minlength=256)
                rank = math.ceil(block.size * black_percentile)
                idx = np.searchsorted(np.cumsum(hist), rank, side="left")
                thresholds[di, dj] = float(min(idx, int(MAX_LEVEL)))
    ti = np.minimum(np.arange(w) // radius, d_w - 1)
    tj = np.minimum(np.arange(h) // radius, d_h - 1)
    thr = thresholds[np.ix_(ti, tj)]
    return np.where(levels <= thr, 0.0, MAX_LEVEL)


# --------------------------------------------------------------- straighten

MIN_ANGLE_RADIANS = -0.05
MAX_ANGLE_RADIANS = 0.05
ANGLE_SAMPLE_POINTS = 20


def rotate_levels(levels: np.ndarray, radians: float) -> np.ndarray:
    """ImageUtils.rotateImage equivalent: rotate the coordinate system
    about the origin, white background, nearest-neighbor sampling."""
    if radians == 0.0:
        return levels.copy()
    w, h = levels.shape
    x = np.arange(w)[:, None]
    y = np.arange(h)[None, :]
    cos, sin = math.cos(radians), math.sin(radians)
    # dest (x,y) <- src (R^-1 (x,y)); g2d.rotate(theta) maps src->dest
    # by R(theta), so sample src at R(-theta) @ dest
    sx = np.rint(cos * x + sin * y).astype(np.int64)
    sy = np.rint(-sin * x + cos * y).astype(np.int64)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    out = np.full((w, h), MAX_LEVEL)
    out[valid] = levels[sx[valid], sy[valid]]
    return out


def vertical_total_variation(levels: np.ndarray) -> float:
    """Straightener.verticalTotalVariation (:171-183)."""
    horizontal_avg = levels.mean(axis=0)
    return float(np.abs(np.diff(horizontal_avg)).sum() / (levels.shape[1] - 1))


def straighten(levels: np.ndarray) -> np.ndarray:
    best_angle, best_tv = None, -np.inf
    for i in range(ANGLE_SAMPLE_POINTS):
        angle = MIN_ANGLE_RADIANS + (i / (ANGLE_SAMPLE_POINTS - 1)) * (
            MAX_ANGLE_RADIANS - MIN_ANGLE_RADIANS
        )
        tv = vertical_total_variation(rotate_levels(levels, angle))
        if tv > best_tv:
            best_tv, best_angle = tv, angle
    return rotate_levels(levels, best_angle)


# -------------------------------------------------------------------- crop

NUM_CROP_POINTS = 200
HORIZ_MIN_CENTER_SEG_RATIO = 0.6
VERT_MIN_CENTER_SEG_RATIO = 0.6
HORIZ_GROW_RATIO = 0.03
INIT_SEG_WEIGHT = 1.0
CENTER_SEG_WEIGHT = 4.0
FINAL_SEG_WEIGHT = 1.0
CONVOLVE_DIST_RATIO = 0.0015


def _convolve_rows(binary: np.ndarray, pixels: int) -> np.ndarray:
    """Cropper.convolveRows (:285-300): smear black horizontally."""
    out = np.full_like(binary, MAX_LEVEL)
    black = binary < MAX_LEVEL
    smear = black.copy()
    for k in range(1, pixels + 1):
        smear[:, k:] |= black[:, :-k]
        smear[:, :-k] |= black[:, k:]
    out[smear] = 0.0
    return out


def _total_variation_profile(levels: np.ndarray) -> np.ndarray:
    return np.abs(np.diff(levels, axis=1)).sum(axis=1) / (levels.shape[1] - 1)


def _eval_segmentation(var_profile: np.ndarray, i: int, j: int) -> float:
    def seg_var(a: np.ndarray) -> float:
        if len(a) == 0:
            return 0.0
        return float(((a - a.mean()) ** 2).mean())

    return (
        INIT_SEG_WEIGHT * seg_var(var_profile[:i])
        + CENTER_SEG_WEIGHT * seg_var(var_profile[i:j])
        + FINAL_SEG_WEIGHT * seg_var(var_profile[j:])
    )


def _single_column_segment(var_profile: np.ndarray, min_center_frac: float) -> Tuple[int, int]:
    n = len(var_profile)
    min_center = int(min_center_frac * n)
    step = max(1, n // NUM_CROP_POINTS)
    best = (np.inf, -1, -1)
    # precompute prefix sums for O(1) segment variances
    cum = np.concatenate([[0.0], np.cumsum(var_profile)])
    cum2 = np.concatenate([[0.0], np.cumsum(var_profile**2)])

    def seg_var(a: int, b: int) -> float:
        m = b - a
        if m <= 0:
            return 0.0
        s, s2 = cum[b] - cum[a], cum2[b] - cum2[a]
        return s2 / m - (s / m) ** 2

    for i in range(0, n, step):
        for j in range(i + min_center, n, step):
            val = (
                INIT_SEG_WEIGHT * seg_var(0, i)
                + CENTER_SEG_WEIGHT * seg_var(i, j)
                + FINAL_SEG_WEIGHT * seg_var(j, n)
            )
            if val < best[0]:
                best = (val, i, j)
    return best[1], best[2]


def crop(levels: np.ndarray, binarize_threshold: float = 0.12) -> np.ndarray:
    """Cropper.crop (:254-273).  levels: (width, height)."""
    binary = binarize_global(binarize_threshold, levels)
    # horizontal crop: profile over columns (x axis)
    lv = levels.T  # (height, width) "rows = y" like reference transpose
    bn = binary.T
    var_profile = _total_variation_profile(
        _convolve_rows(bn.T, int(CONVOLVE_DIST_RATIO * bn.shape[0])).T
    )
    i, j = _single_column_segment(var_profile, HORIZ_MIN_CENTER_SEG_RATIO)
    grow = int(lv.shape[0] * HORIZ_GROW_RATIO)
    lv = lv[max(0, i - grow) : min(lv.shape[0], j + grow)]
    # vertical crop
    lv = lv.T
    bn = bn.T
    var_profile = _total_variation_profile(
        _convolve_rows(bn.T, int(CONVOLVE_DIST_RATIO * lv.shape[0])).T
    )
    i, j = _single_column_segment(var_profile, VERT_MIN_CENTER_SEG_RATIO)
    grow = int(lv.shape[0] * HORIZ_GROW_RATIO)
    lv = lv[max(0, i - grow) : min(lv.shape[0], j + grow)]
    return lv


# ------------------------------------------------------- line extraction

def gaussian_log_prob(mean: float, var: float, x: np.ndarray) -> np.ndarray:
    return -0.5 * np.log(2.0 * np.pi * var) - (np.asarray(x, dtype=np.float64) - mean) ** 2 / (
        2.0 * var
    )


class VerticalModel:
    """preprocessing/VerticalModel.java (3-state cyclic semi-Markov)."""

    def __init__(self, image_width, emission_means, emission_variance, size_means, size_variances):
        self.image_width = image_width
        self.emission_variance = emission_variance
        self.size_variances = np.asarray(size_variances, dtype=np.float64)
        self.update_means_only(emission_means, size_means)

    @classmethod
    def random_init(cls, image_width: int, rand: JavaRandom) -> "VerticalModel":
        black_fracs = sorted(0.8 * rand.next_double() for _ in range(2))
        emission_means = [
            black_fracs[0] * image_width,
            black_fracs[1] * image_width,
            black_fracs[0] * image_width,
        ]
        emission_std = 0.05
        emission_var = (emission_std * image_width) ** 2
        non_space_mean = rand.next_int(30 - 6) + 6
        space_mean = rand.next_int(30 - 6) + 6
        size_means = [non_space_mean, non_space_mean, space_mean]
        return cls(image_width, emission_means, emission_var, size_means, [4.0, 4.0, 4.0])

    def update_means_only(self, emission_means, size_means) -> None:
        # variance annealing x0.8^2 per update (VerticalModel.java:485-488)
        self.size_variances = (np.sqrt(self.size_variances) * 0.8) ** 2
        self.emission_variance = (math.sqrt(self.emission_variance) * 0.8) ** 2
        self._set_emission_params(np.asarray(emission_means, dtype=np.float64))
        self._set_size_params(np.asarray(size_means, dtype=np.float64))

    def _set_emission_params(self, means: np.ndarray) -> None:
        j = np.arange(self.image_width)
        lp = np.stack([gaussian_log_prob(m, self.emission_variance, j) for m in means])
        lp = lp - np.log(np.exp(lp).sum(axis=1))[:, None]
        self.emission_log_probs = lp  # (3, image_width)

    def _set_size_params(self, means: np.ndarray) -> None:
        rows = []
        for s in range(3):
            sizes = np.arange(MIN_SIZES[s], MAX_SIZES[s])
            lp = gaussian_log_prob(means[s], self.size_variances[s], sizes)
            lp = lp - np.log(np.exp(lp).sum())
            rows.append(lp)
        self.size_log_probs = rows  # per state, len maxSize-minSize

    def row_log_probs(self, emissions_per_row: np.ndarray) -> np.ndarray:
        """(3, n_rows): per-state log prob of each row's black count."""
        idx = np.minimum(emissions_per_row.astype(np.int64), self.image_width - 1)
        return self.emission_log_probs[:, idx]


def _logaddexp(a, b):
    return np.logaddexp(a, b)


class VerticalProfile:
    """preprocessing/VerticalProfile.java — EM + Viterbi decode."""

    def __init__(self, levels: np.ndarray) -> None:
        self.levels = levels
        # black pixels per row (y): pixel BLACK iff level <= 255/2
        self.emissions_per_row = (levels <= MAX_LEVEL / 2.0).sum(axis=0).astype(np.float64)

    def _dp(self, model: VerticalModel, use_max: bool):
        n = len(self.emissions_per_row)
        row_lp = model.row_log_probs(self.emissions_per_row)  # (3, n)
        row_cum = np.concatenate([np.zeros((3, 1)), np.cumsum(row_lp, axis=1)], axis=1)
        alphas = np.full((n + 1, 3), -np.inf)
        alphas[0, :] = math.log(1.0 / 3.0)
        comb = np.maximum if use_max else np.logaddexp
        for i in range(n):
            for state in range(3):
                prev = (state + 2) % 3
                if alphas[i, prev] == -np.inf:
                    continue
                sizes = np.arange(MIN_SIZES[state], MAX_SIZES[state])
                ends = i + sizes
                ok = ends <= n
                if not ok.any():
                    continue
                sizes, ends = sizes[ok], ends[ok]
                inc = (
                    alphas[i, prev]
                    + model.size_log_probs[state][: len(sizes)]
                    + (row_cum[state, ends] - row_cum[state, i])
                )
                alphas[ends, state] = comb(alphas[ends, state], inc)
        return alphas, row_cum

    def _betas(self, model: VerticalModel):
        n = len(self.emissions_per_row)
        row_lp = model.row_log_probs(self.emissions_per_row)
        row_cum = np.concatenate([np.zeros((3, 1)), np.cumsum(row_lp, axis=1)], axis=1)
        betas = np.full((n + 1, 3), -np.inf)
        betas[n, :] = 0.0
        for i in range(n - 1, -1, -1):
            for state in range(3):
                nxt = (state + 1) % 3
                sizes = np.arange(MIN_SIZES[nxt], MAX_SIZES[nxt])
                ends = i + sizes
                ok = ends <= n
                if not ok.any():
                    continue
                sizes, ends = sizes[ok], ends[ok]
                vals = (
                    betas[ends, nxt]
                    + model.size_log_probs[nxt][: len(sizes)]
                    + (row_cum[nxt, ends] - row_cum[nxt, i])
                )
                finite = vals > -np.inf
                if finite.any():
                    betas[i, state] = np.logaddexp.reduce(vals[finite])
        return betas, row_cum

    def run_em(self, num_iters: int = 5, num_restarts: int = 100) -> VerticalModel:
        best_lp, best_model = -np.inf, None
        rand = JavaRandom(0)  # reference: new Random(0), VerticalProfile.java:233
        n = len(self.emissions_per_row)
        for _r in range(num_restarts):
            model = VerticalModel.random_init(self.levels.shape[0], rand)
            log_norm = -np.inf
            for _it in range(num_iters):
                alphas, row_cum = self._dp(model, use_max=False)
                betas, _ = self._betas(model)
                log_norm = np.logaddexp.reduce(alphas[n, :])
                if not np.isfinite(log_norm):
                    break
                total_mass = np.zeros(3)
                total_mass_len = np.zeros(3)
                total_emission_mass = np.zeros(3)
                total_size_mass = np.zeros(3)
                em_cum = np.concatenate([[0.0], np.cumsum(self.emissions_per_row)])
                for state in range(3):
                    prev = (state + 2) % 3
                    for k, size in enumerate(range(MIN_SIZES[state], MAX_SIZES[state])):
                        i_arr = np.arange(0, n - size + 1)
                        lp = (
                            alphas[i_arr, prev]
                            + model.size_log_probs[state][k]
                            + (row_cum[state, i_arr + size] - row_cum[state, i_arr])
                            + betas[i_arr + size, state]
                        )
                        mass = np.exp(lp - log_norm)
                        msum = mass.sum()
                        total_mass[state] += msum
                        total_mass_len[state] += msum * size
                        total_emission_mass[state] += (
                            mass * (em_cum[i_arr + size] - em_cum[i_arr])
                        ).sum()
                        total_size_mass[state] += msum * size
                with np.errstate(invalid="ignore", divide="ignore"):
                    emission_means = total_emission_mass / total_mass_len
                    size_means = total_size_mass / total_mass
                model.update_means_only(emission_means, size_means)
            if log_norm > best_lp:
                best_lp, best_model = log_norm, model
        return best_model

    def decode(self, model: VerticalModel) -> List[Tuple[int, int]]:
        """Viterbi; returns [(state_type, start_index)] segments."""
        n = len(self.emissions_per_row)
        alphas, row_cum = self._dp(model, use_max=True)
        curr_idx = n
        curr_state = int(np.argmax(alphas[n, :]))
        segments: List[Tuple[int, int]] = []
        while curr_idx > 0:
            prev = (curr_state + 2) % 3
            best_size, best_score = -1, -np.inf
            for k, size in enumerate(range(MIN_SIZES[curr_state], MAX_SIZES[curr_state])):
                if curr_idx - size >= 0:
                    score = (
                        alphas[curr_idx - size, prev]
                        + model.size_log_probs[curr_state][k]
                        + (row_cum[curr_state, curr_idx] - row_cum[curr_state, curr_idx - size])
                    )
                    if score > best_score:
                        best_size, best_score = size, score
            segments.insert(0, (curr_state, curr_idx - best_size))
            curr_idx -= best_size
            curr_state = prev
        return segments


def retrieve_baselines(segments: List[Tuple[int, int]], total_size: int) -> List[int]:
    """VerticalSegmentation.retrieveBaselines (:190-202)."""
    baselines = []
    for i, (stype, _start) in enumerate(segments):
        if stype == BASE:
            if i >= len(segments) - 1:
                baselines.append(total_size)
            else:
                baselines.append(segments[i + 1][1])
    return baselines


TOP_DIST = 29  # LineExtractor.java:28
BOT_DIST = 11  # :29


def extract_lines(
    levels: np.ndarray, num_iters: int = 5, num_restarts: int = 100
) -> List[np.ndarray]:
    """LineExtractor.extractLines (:19-75): per baseline, slice the
    fixed band [base-29, base+11)."""
    profile = VerticalProfile(levels)
    model = profile.run_em(num_iters, num_restarts)
    segments = profile.decode(model)
    height = levels.shape[1]
    out = []
    for base in retrieve_baselines(segments, height):
        line = np.full((levels.shape[0], TOP_DIST + BOT_DIST), MAX_LEVEL)
        lo, hi = base - TOP_DIST, base + BOT_DIST
        src_lo, src_hi = max(0, lo), min(height, hi)
        line[:, src_lo - lo : src_lo - lo + (src_hi - src_lo)] = levels[:, src_lo:src_hi]
        out.append(line)
    return out


# ----------------------------------------------------------------- resample

def resample_to_height(levels: np.ndarray, height: int = LINE_HEIGHT) -> np.ndarray:
    """ImageUtils.resampleImage equivalent (nearest-neighbor; AWT
    SCALE_DEFAULT is replicate/nearest)."""
    w, h = levels.shape
    mult = height / float(h)
    new_w = max(1, int(mult * w))
    xi = np.minimum((np.arange(new_w) / mult).astype(np.int64), w - 1)
    yi = np.minimum((np.arange(height) / mult).astype(np.int64), h - 1)
    return levels[np.ix_(xi, yi)]


def levels_to_pixels(levels: np.ndarray) -> np.ndarray:
    """ImageUtils.getPixelTypes: level <= 255/2 -> BLACK(1) else WHITE(0)."""
    return np.where(levels <= MAX_LEVEL / 2.0, 1, 0).astype(np.uint8)


def prepare_page(
    levels: np.ndarray,
    binarize_threshold: float = 0.12,
    do_straighten: bool = True,
    do_crop: bool = True,
    num_em_iters: int = 5,
    num_em_restarts: int = 100,
) -> List[np.ndarray]:
    """The full per-page chain (LazyRawImageDocument.java:80-92):
    straighten -> crop -> binarize -> extractLines -> resample ->
    PixelType arrays (each (T, LINE_HEIGHT) uint8)."""
    lv = levels.astype(np.float64)
    if do_straighten:
        lv = straighten(lv)
    if do_crop:
        lv = crop(lv, binarize_threshold)
    lv = binarize_global(binarize_threshold, lv)
    lines = extract_lines(lv, num_em_iters, num_em_restarts)
    return [levels_to_pixels(resample_to_height(l, LINE_HEIGHT)) for l in lines]
