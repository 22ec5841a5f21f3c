"""Font model: per-character logistic pixel templates.

Re-expresses ``model/CharacterTemplate.java`` (tberg12/ocular) in
NumPy.  A template for char c is a logit image ``template_weights
(max_width, 30) float32``; rendering at width w and exposure e uses
fixed interpolation weights (gaussian resampling of template columns,
CharacterTemplate.java:107-126); pixel log-probs are the logistic
``log sigma(±inner)`` (templateLogProbs, :416-435).  Width
distribution is a thresholded gaussian refit from counts (:344-371).
M-step = L-BFGS on the negative expected log-likelihood with an L2
prior pulling to the init font (EMIT_REG=1e-2, :500-510).

All emission tensors are float32 (matching the reference's float[]),
accumulation in float64 for order-independence; broadcast to
executors as a plain dict of arrays (font/Font.java is just
Map<String, CharacterTemplate>).

Pixel encoding used throughout the pipeline (image/ImageUtils.java:33-35):
  0 = WHITE, 1 = BLACK, 2 = OBSCURED (log-prob contribution 0.0).
"""

from __future__ import annotations

import io
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ocular_spark.charset import SPACE
from ocular_spark.optimize import lbfgs_minimize

LINE_HEIGHT = 30  # CharacterTemplate.java:27

EXP_GAINS = np.array([1.0, 0.5, 0.25], dtype=np.float32)  # :29
EXP_STD_DEVS = np.array([1.5, 1.5, 1.5], dtype=np.float32)  # :30
EXP_SPC_BLACK_PROBS = np.array([5e-2, 2e-2, 1e-1], dtype=np.float32)  # :31
N_EXPOSURES = len(EXP_GAINS)

MAX_OFFSET = 5  # :33
EMIT_REG = 1e-2  # :35

INIT_WIDTH_STD_THRESH = 2.5
INIT_WIDTH_MIN_VAR = 1e-2
LEARN_WIDTH_STD_THRESH = 2.5
LEARN_WIDTH_MIN_VAR = 1e-2

INIT_LBFGS_TOL = 1e-10
INIT_LBFGS_ITERS = 1000
MSTEP_LBFGS_TOL = 1e-5
MSTEP_LBFGS_ITERS = 20

WHITE, BLACK, OBSCURED = 0, 1, 2


def gaussian_log_prob_sqr(sqr_dist: np.ndarray, var: float) -> np.ndarray:
    """murphy ``m.gaussianLogProb(sqrDist, var)`` equivalent; the
    normalizing constant cancels under the row normalization below."""
    return -0.5 * np.log(2.0 * np.pi * var) - sqr_dist / (2.0 * var)


def _interpolation_weights(max_width: int, min_width: int) -> List[List[np.ndarray]]:
    """interpolationWeights[e][w] -> (width, max_width) float32
    (CharacterTemplate.java:107-126)."""
    out: List[List[np.ndarray]] = []
    n_widths = max_width - min_width + 1
    for e in range(N_EXPOSURES):
        per_w: List[np.ndarray] = []
        for w in range(n_widths):
            width = min_width + w
            interval = float(max_width) / float(width)
            i = np.arange(width, dtype=np.float64)[:, None]
            j = np.arange(max_width, dtype=np.float64)[None, :]
            emission_loc = interval * (i + 0.5)
            template_loc = j + 0.5
            sqr = (template_loc - emission_loc) ** 2
            wts = np.exp(gaussian_log_prob_sqr(sqr, float(EXP_STD_DEVS[e]) * interval))
            wts /= wts.sum(axis=1, keepdims=True)
            wts *= float(EXP_GAINS[e])
            per_w.append(wts.astype(np.float32))
        out.append(per_w)
    return out


def build_gaussian_width_probs(
    mean: float, var: float, min_w: int, max_w: int, std_thresh: float
) -> np.ndarray:
    """buildGuassianWidthProbs (CharacterTemplate.java:361-371)."""
    widths = np.arange(min_w, max_w + 1, dtype=np.float64)
    sqr = (mean - widths) ** 2
    probs = np.where(
        np.sqrt(sqr) < std_thresh * np.sqrt(var), np.exp(-sqr / (2.0 * var)), 0.0
    )
    total = probs.sum()
    if total > 0:
        probs = probs / total
    return probs.astype(np.float32)


class CharacterTemplate:
    def __init__(
        self,
        character: str,
        template_max_width_fraction: float = 1.0,
        template_min_width_fraction: float = 0.0,
    ) -> None:
        self.character = character
        self.max_width = max(1, int(np.floor(template_max_width_fraction * LINE_HEIGHT)))
        self.min_width = max(1, int(np.floor(template_min_width_fraction * LINE_HEIGHT)))
        n_widths = self.max_width - self.min_width + 1
        self.width_probs = np.full(n_widths, 1.0 / n_widths, dtype=np.float32)
        self.width_counts = np.zeros(n_widths, dtype=np.float64)
        self.is_space = character == SPACE
        if not self.is_space:
            self.template_weights = np.zeros((self.max_width, LINE_HEIGHT), dtype=np.float32)
            self.prior_means = np.zeros((self.max_width, LINE_HEIGHT), dtype=np.float32)
            self.interpolation_weights = _interpolation_weights(self.max_width, self.min_width)
            # counts[e][w]: (width, LINE_HEIGHT) float64 accumulators
            self.black_counts = [
                [np.zeros((self.min_width + w, LINE_HEIGHT)) for w in range(n_widths)]
                for _ in range(N_EXPOSURES)
            ]
            self.white_counts = [
                [np.zeros((self.min_width + w, LINE_HEIGHT)) for w in range(n_widths)]
                for _ in range(N_EXPOSURES)
            ]
            self.count_sparsity = np.zeros((N_EXPOSURES, n_widths), dtype=bool)
            self._log_prob_cache: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}

    # ---- probabilities ----

    def n_widths(self) -> int:
        return self.max_width - self.min_width + 1

    def allowed_widths(self) -> List[int]:
        return [
            w
            for w in range(self.min_width, self.max_width + 1)
            if self.width_probs[w - self.min_width] > 0.0
        ]

    def width_prob(self, width: int) -> float:
        return float(self.width_probs[width - self.min_width])

    def width_log_prob(self, width: int) -> float:
        p = self.width_probs[width - self.min_width]
        return float(np.log(p)) if p > 0 else float("-inf")

    def _template_log_probs(self, width: int, e: int) -> Tuple[np.ndarray, np.ndarray]:
        """(logBlack, logWhite), each (width, LINE_HEIGHT) float32
        (templateLogProbs, CharacterTemplate.java:416-435)."""
        key = (width, e)
        cached = self._log_prob_cache.get(key)
        if cached is None:
            interp = self.interpolation_weights[e][width - self.min_width]
            inner = interp.astype(np.float64) @ self.template_weights.astype(np.float64)
            log1p = np.logaddexp(0.0, inner)  # log(1 + e^inner)
            log_black = (inner - log1p).astype(np.float32)
            log_white = (-log1p).astype(np.float32)
            cached = (log_black, log_white)
            self._log_prob_cache[key] = cached
        return cached

    def log_black_probs(self, exposure: int, offset: int, width: int) -> np.ndarray:
        """(width, LINE_HEIGHT) float32; rows j index the observation,
        looked up at clip(j+offset) in the template (:185-201)."""
        if self.is_space:
            return np.full(
                (width, LINE_HEIGHT), np.log(EXP_SPC_BLACK_PROBS[exposure]), dtype=np.float32
            )
        lb, _ = self._template_log_probs(width, exposure)
        j = np.clip(np.arange(LINE_HEIGHT) + offset, 0, LINE_HEIGHT - 1)
        return lb[:, j]

    def log_white_probs(self, exposure: int, offset: int, width: int) -> np.ndarray:
        if self.is_space:
            return np.full(
                (width, LINE_HEIGHT),
                np.log(1.0 - EXP_SPC_BLACK_PROBS[exposure]),
                dtype=np.float32,
            )
        _, lw = self._template_log_probs(width, exposure)
        j = np.clip(np.arange(LINE_HEIGHT) + offset, 0, LINE_HEIGHT - 1)
        return lw[:, j]

    def black_probs(self, exposure: int, offset: int, width: int) -> np.ndarray:
        return np.exp(self.log_black_probs(exposure, offset, width))

    def emission_log_prob(
        self, observations: np.ndarray, start_col: int, end_col: int, exposure: int, offset: int
    ) -> float:
        """observations: (n_cols, LINE_HEIGHT) uint8 in {WHITE,BLACK,OBSCURED}
        (emissionLogProb, :221-236)."""
        width = end_col - start_col
        obs = observations[start_col:end_col]
        lb = self.log_black_probs(exposure, offset, width)
        lw = self.log_white_probs(exposure, offset, width)
        return float(np.where(obs == BLACK, lb, np.where(obs == WHITE, lw, 0.0)).sum())

    # ---- counts / M-step ----

    def clear_counts(self) -> None:
        self.width_counts[:] = 0.0
        if not self.is_space:
            self.count_sparsity[:] = False
            for e in range(N_EXPOSURES):
                for w in range(self.n_widths()):
                    self.black_counts[e][w][:] = 0.0
                    self.white_counts[e][w][:] = 0.0

    def increment_width_counts(self, width: int, count: float) -> None:
        self.width_counts[width - self.min_width] += count

    def increment_counts(
        self,
        count: float,
        observations: np.ndarray,
        start_col: int,
        width: int,
        exposure: int,
        offset: int,
    ) -> None:
        """incrementCounts (:271-276): offset-shifted pixel counts."""
        if not self.is_space:
            w = width - self.min_width
            obs = observations[start_col : start_col + width]
            j = np.clip(np.arange(LINE_HEIGHT) + offset, 0, LINE_HEIGHT - 1)
            bc = self.black_counts[exposure][w]
            wc = self.white_counts[exposure][w]
            black = (obs == BLACK).astype(np.float64) * count
            white = (obs == WHITE).astype(np.float64) * count
            np.add.at(bc, (slice(None), j), black)
            np.add.at(wc, (slice(None), j), white)
            if count > 0:
                self.count_sparsity[exposure, w] = True
        self.increment_width_counts(width, count)

    def update_width_parameters(
        self, width_min_var: float = LEARN_WIDTH_MIN_VAR, std_thresh: float = LEARN_WIDTH_STD_THRESH
    ) -> None:
        if self.is_space:
            return
        total = self.width_counts.sum()
        if total > 0:
            widths = np.arange(self.min_width, self.max_width + 1, dtype=np.float64)
            p = self.width_counts / total
            mean = float((widths * p).sum())
            var = float(((mean - widths) ** 2 * p).sum())
            self.width_probs = build_gaussian_width_probs(
                mean, max(width_min_var, var), self.min_width, self.max_width, std_thresh
            )

    def _neg_ell_and_grad(self, params: np.ndarray, prior: np.ndarray) -> Tuple[float, np.ndarray]:
        weights = params.reshape(self.max_width, LINE_HEIGHT)
        f = 0.0
        grad = np.zeros_like(weights)
        for e in range(N_EXPOSURES):
            for w in range(self.n_widths()):
                if not self.count_sparsity[e, w]:
                    continue
                interp = self.interpolation_weights[e][w].astype(np.float64)
                inner = interp @ weights
                log1p = np.logaddexp(0.0, inner)
                log_black = inner - log1p
                log_white = -log1p
                bc = self.black_counts[e][w]
                wc = self.white_counts[e][w]
                f -= float((bc * log_black + wc * log_white).sum())
                sig = np.exp(log_black)
                # dNLL/dinner = -(bc - (bc+wc) * sigma(inner))
                dinner = -(bc - (bc + wc) * sig)
                grad += interp.T @ dinner
        delta = params - prior
        f += EMIT_REG * float(delta @ delta)
        g = grad.ravel() + 2.0 * EMIT_REG * delta
        return f, g

    def update_emission_parameters(
        self, tol: float = MSTEP_LBFGS_TOL, iters: int = MSTEP_LBFGS_ITERS
    ) -> None:
        if self.is_space:
            return
        prior = self.prior_means.astype(np.float64).ravel()
        x0 = self.template_weights.astype(np.float64).ravel()
        x = lbfgs_minimize(lambda p: self._neg_ell_and_grad(p, prior), x0, tol, iters)
        self.template_weights = x.reshape(self.max_width, LINE_HEIGHT).astype(np.float32)
        self._log_prob_cache = {}

    def initialize_and_set_prior_from_font_data(
        self, font_data: Sequence[np.ndarray]
    ) -> None:
        """initializeAndSetPriorFromFontData (:138-155).

        font_data: iterable of (width, LINE_HEIGHT) pixel arrays."""
        if self.is_space:
            return
        self.clear_counts()
        for obs in font_data:
            width = obs.shape[0]
            if self.min_width <= width <= self.max_width:
                self.increment_counts(1.0, obs, 0, width, 0, 0)
        self.update_width_parameters(INIT_WIDTH_MIN_VAR, INIT_WIDTH_STD_THRESH)
        self.update_emission_parameters(INIT_LBFGS_TOL, INIT_LBFGS_ITERS)
        self.prior_means = self.template_weights.copy()

    def update_parameters(self) -> None:
        self.update_width_parameters(LEARN_WIDTH_MIN_VAR, LEARN_WIDTH_STD_THRESH)
        self.update_emission_parameters(MSTEP_LBFGS_TOL, MSTEP_LBFGS_ITERS)

    def ascii_art(self) -> str:
        """CharacterTemplate.toString (:287-314): ./o/O rendering of
        black probabilities at the most likely width."""
        if self.is_space:
            return "%s: (space)\n" % self.character
        widths = self.allowed_widths()
        best_w = max(widths, key=self.width_prob) if widths else self.max_width
        bp = self.black_probs(N_EXPOSURES // 2, 0, best_w)
        rows = []
        for j in range(LINE_HEIGHT):
            rows.append(
                " ".join(
                    "." if bp[i, j] < 0.333 else ("o" if bp[i, j] < 0.666 else "O")
                    for i in range(best_w)
                )
            )
        return "%s:\n%s\n" % (self.character, "\n".join(rows))

    # ---- (de)serialization: flat arrays for broadcast / npz / parquet ----

    def to_arrays(self) -> Dict[str, np.ndarray]:
        d = {
            "min_width": np.int32(self.min_width),
            "max_width": np.int32(self.max_width),
            "width_probs": self.width_probs,
            "is_space": np.bool_(self.is_space),
        }
        if not self.is_space:
            d["template_weights"] = self.template_weights
            d["prior_means"] = self.prior_means
        return d

    @classmethod
    def from_arrays(cls, character: str, arrays: Dict[str, np.ndarray]) -> "CharacterTemplate":
        t = cls.__new__(cls)
        t.character = character
        t.min_width = int(arrays["min_width"])
        t.max_width = int(arrays["max_width"])
        t.width_probs = np.asarray(arrays["width_probs"], dtype=np.float32)
        t.width_counts = np.zeros(t.n_widths(), dtype=np.float64)
        t.is_space = bool(arrays["is_space"])
        if not t.is_space:
            t.template_weights = np.asarray(arrays["template_weights"], dtype=np.float32)
            t.prior_means = np.asarray(arrays["prior_means"], dtype=np.float32)
            t.interpolation_weights = _interpolation_weights(t.max_width, t.min_width)
            n_widths = t.n_widths()
            t.black_counts = [
                [np.zeros((t.min_width + w, LINE_HEIGHT)) for w in range(n_widths)]
                for _ in range(N_EXPOSURES)
            ]
            t.white_counts = [
                [np.zeros((t.min_width + w, LINE_HEIGHT)) for w in range(n_widths)]
                for _ in range(N_EXPOSURES)
            ]
            t.count_sparsity = np.zeros((N_EXPOSURES, n_widths), dtype=bool)
            t._log_prob_cache = {}
        return t


class Font:
    """font/Font.java: Map<String, CharacterTemplate> + npz persistence."""

    def __init__(self, templates: Dict[str, CharacterTemplate]) -> None:
        self.templates = templates

    def get(self, character: str) -> CharacterTemplate:
        return self.templates[character]

    def __contains__(self, character: str) -> bool:
        return character in self.templates

    def characters(self) -> List[str]:
        return list(self.templates)

    def save_npz(self, path: str) -> None:
        payload: Dict[str, np.ndarray] = {}
        chars = list(self.templates)
        payload["__chars__"] = np.array(chars, dtype=object)
        for i, c in enumerate(chars):
            for k, v in self.templates[c].to_arrays().items():
                payload["t%d__%s" % (i, k)] = v
        with open(path, "wb") as f:
            np.savez_compressed(f, **payload)

    @classmethod
    def load_npz(cls, path: str) -> "Font":
        data = np.load(path, allow_pickle=True)
        chars = list(data["__chars__"])
        templates = {}
        for i, c in enumerate(chars):
            prefix = "t%d__" % i
            arrays = {
                k[len(prefix) :]: data[k] for k in data.files if k.startswith(prefix)
            }
            templates[str(c)] = CharacterTemplate.from_arrays(str(c), arrays)
        return cls(templates)

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        payload: Dict[str, np.ndarray] = {}
        chars = list(self.templates)
        payload["__chars__"] = np.array(chars, dtype=object)
        for i, c in enumerate(chars):
            for k, v in self.templates[c].to_arrays().items():
                payload["t%d__%s" % (i, k)] = v
        np.savez_compressed(buf, **payload)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Font":
        data = np.load(io.BytesIO(raw), allow_pickle=True)
        chars = list(data["__chars__"])
        templates = {}
        for i, c in enumerate(chars):
            prefix = "t%d__" % i
            arrays = {
                k[len(prefix) :]: data[k] for k in data.files if k.startswith(prefix)
            }
            templates[str(c)] = CharacterTemplate.from_arrays(str(c), arrays)
        return cls(templates)
