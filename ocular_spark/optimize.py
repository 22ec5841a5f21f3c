"""Minimal L-BFGS minimizer (two-loop recursion + backtracking
Armijo/weak-Wolfe line search), NumPy only.

Stands in for the reference's ``tberg.murphy.opt.LBFGSMinimizer``
(used by model/CharacterTemplate.java:402-408 for the font M-step and
by main/InitializeFont.java for template init), since murphy.jar is
absent and scipy is not in this environment.  Standard published
algorithm (Nocedal & Wright, Numerical Optimization, Alg. 7.4/7.5).

Convergence rule mirrors the reference's relative-improvement test:
stop when (f_prev - f) <= tol * |f_prev| or after max_iters.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def lbfgs_minimize(
    func: Callable[[np.ndarray], Tuple[float, np.ndarray]],
    x0: np.ndarray,
    tol: float = 1e-10,
    max_iters: int = 1000,
    history: int = 10,
) -> np.ndarray:
    x = np.asarray(x0, dtype=np.float64).copy()
    f, g = func(x)
    s_hist: list = []
    y_hist: list = []
    rho_hist: list = []

    for _ in range(max_iters):
        if not np.all(np.isfinite(g)):
            break
        # two-loop recursion
        q = g.copy()
        alphas = []
        for s, y, rho in zip(reversed(s_hist), reversed(y_hist), reversed(rho_hist)):
            a_i = rho * s.dot(q)
            alphas.append(a_i)
            q -= a_i * y
        if y_hist:
            ys = y_hist[-1]
            gamma = s_hist[-1].dot(ys) / max(ys.dot(ys), 1e-300)
            q *= gamma
        for (s, y, rho), a_i in zip(zip(s_hist, y_hist, rho_hist), reversed(alphas)):
            b_i = rho * y.dot(q)
            q += (a_i - b_i) * s
        d = -q
        gtd = g.dot(d)
        if gtd >= 0:  # not a descent direction; restart with steepest descent
            d = -g
            gtd = -g.dot(g)
            s_hist.clear()
            y_hist.clear()
            rho_hist.clear()
        if gtd == 0.0:
            break

        # backtracking Armijo line search
        step = 1.0
        c1 = 1e-4
        f_new, g_new, x_new = f, g, x
        ok = False
        for _ls in range(40):
            x_new = x + step * d
            f_new, g_new = func(x_new)
            if np.isfinite(f_new) and f_new <= f + c1 * step * gtd:
                ok = True
                break
            step *= 0.5
        if not ok:
            break

        s = x_new - x
        y = g_new - g
        sy = s.dot(y)
        if sy > 1e-12:
            s_hist.append(s)
            y_hist.append(y)
            rho_hist.append(1.0 / sy)
            if len(s_hist) > history:
                s_hist.pop(0)
                y_hist.pop(0)
                rho_hist.pop(0)

        f_prev = f
        x, f, g = x_new, f_new, g_new
        if f_prev - f <= tol * abs(f_prev):
            break
    return x
