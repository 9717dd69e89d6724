"""Penalized (sparse) linear/logistic regression with CMSA.

The bigstatsr surface the reference stacks C+T scores with
(big_spLogReg / big_spLinReg, used at reference R/SCT.R:266-304):
elastic-net path fit per cross-validation fold with early stopping on the
held fold ("Cross-Model Selection and Averaging", Privé et al. 2019),
final coefficients = average over folds; alpha grid-searched.

Implementation: cyclic coordinate descent on standardized features in
f64 numpy (feature counts here are ~10^3: the stacking design matrix),
warm-started along a decreasing lambda path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


def _soft(x, t):
    return np.sign(x) * np.maximum(np.abs(x) - t, 0.0)


def _cd_gaussian_path(X, y, lambdas, alpha, Xval, yval, n_abort=10,
                      tol=1e-7, maxit=200):
    n, p = X.shape
    beta = np.zeros(p)
    intercept = y.mean()
    r = y - intercept
    xsq = (X**2).sum(axis=0) / n
    best = (np.inf, None, None, 0)
    for li, lam in enumerate(lambdas):
        l1, l2 = lam * alpha, lam * (1 - alpha)
        for _ in range(maxit):
            max_d = 0.0
            for j in range(p):
                bj = beta[j]
                rho = X[:, j] @ r / n + xsq[j] * bj
                new = _soft(rho, l1) / (xsq[j] + l2)
                if new != bj:
                    r -= X[:, j] * (new - bj)
                    beta[j] = new
                    max_d = max(max_d, abs(new - bj))
            di = r.mean()
            if di != 0:
                intercept += di
                r -= di
            if max_d < tol:
                break
        pred_val = Xval @ beta + intercept
        loss = np.mean((yval - pred_val) ** 2)
        if loss < best[0]:
            best = (loss, beta.copy(), intercept, li)
        if li - best[3] >= n_abort:
            break
    return best


def _cd_binomial_path(X, y, lambdas, alpha, Xval, yval, n_abort=10,
                      tol=1e-6, maxit=50):
    """IRLS + CD (glmnet-style quadratic approximation)."""
    n, p = X.shape
    beta = np.zeros(p)
    intercept = np.log(max(y.mean(), 1e-9) / max(1 - y.mean(), 1e-9))
    best = (np.inf, None, None, 0)
    for li, lam in enumerate(lambdas):
        l1, l2 = lam * alpha, lam * (1 - alpha)
        for _ in range(maxit):
            eta = intercept + X @ beta
            mu = 1.0 / (1.0 + np.exp(-eta))
            w = np.maximum(mu * (1 - mu), 1e-6)
            z = eta + (y - mu) / w
            # one full CD pass on the weighted LS problem
            max_d = 0.0
            r = z - eta
            wsum = w.sum()
            for j in range(p):
                bj = beta[j]
                wxx = (w * X[:, j] ** 2).sum() / n
                rho = (w * X[:, j] * r).sum() / n + wxx * bj
                new = _soft(rho, l1) / (wxx + l2)
                if new != bj:
                    r -= X[:, j] * (new - bj)
                    beta[j] = new
                    max_d = max(max_d, abs(new - bj))
            di = (w * r).sum() / wsum
            intercept += di
            r -= di
            if max_d < tol and abs(di) < tol:
                break
        eta_val = intercept + Xval @ beta
        mu_val = np.clip(1.0 / (1.0 + np.exp(-eta_val)), 1e-9, 1 - 1e-9)
        loss = -np.mean(yval * np.log(mu_val) + (1 - yval) * np.log(1 - mu_val))
        if loss < best[0]:
            best = (loss, beta.copy(), intercept, li)
        if li - best[3] >= n_abort:
            break
    return best


@dataclass
class SpRegModel:
    beta: np.ndarray          # averaged over folds, on original feature scale
    intercept: float
    family: str
    alpha: float
    fold_losses: np.ndarray

    def predict(self, X):
        eta = X @ self.beta + self.intercept
        if self.family == "binomial":
            return 1.0 / (1.0 + np.exp(-eta))
        return eta


def big_spReg(X, y, family=None, alphas=(1.0, 0.01, 0.0001), K=10,
              nlambda=200, lambda_min_ratio=1e-4, n_abort=10, seed=1,
              covar=None, tol=None, maxit=None) -> SpRegModel:
    """CMSA elastic-net (big_spLogReg/big_spLinReg equivalent).

    covar columns, if given, are appended unpenalized... (penalized here;
    the stacking use-case passes none).
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if covar is not None:
        X = np.column_stack([X, np.asarray(covar, dtype=np.float64)])
    n, p = X.shape
    if family is None:
        family = "binomial" if len(np.unique(y)) == 2 else "gaussian"

    # standardize features (CD operates on standardized scale)
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd

    yc = y - y.mean() if family == "gaussian" else y
    lam_max = np.max(np.abs(Xs.T @ (yc - yc.mean()))) / n
    lam_max = max(lam_max, 1e-6)

    rng = np.random.default_rng(seed)
    folds = rng.permutation(n) % K

    # native C++ CD when available (CD is inherently sequential per
    # coordinate — the python loop is interpreter-bound beyond ~10^3
    # features); folds run in threads (ctypes releases the GIL)
    try:
        from bigsnpr_tpu import native as native_mod
    except Exception:  # noqa: BLE001 — fall back to python CD
        native_mod = None
    tol_d, maxit_d = ((1e-6, 50) if family == "binomial" else (1e-7, 200))
    tol = tol_d if tol is None else float(tol)
    maxit = maxit_d if maxit is None else int(maxit)

    def fit_fold(Xtr, ytr, lambdas, alpha, Xva, yva):
        if native_mod is not None:
            fit = native_mod.cd_path(Xtr, ytr, lambdas, alpha, Xva, yva,
                                     n_abort, tol, maxit, family=family)
            if fit is not None:
                return fit
        return (_cd_binomial_path if family == "binomial"
                else _cd_gaussian_path)(
            Xtr, ytr, lambdas, alpha, Xva, yva, n_abort=n_abort,
            tol=tol, maxit=maxit)

    # covariance-mode (Gram) CD when n >> p: per-fold Grams are one
    # dgemm each, then every CD pass costs O(p^2) independent of n —
    # the difference between minutes and an hour at biobank n
    # (glmnet's "covariance updating"; same fixed point and selection)
    gram_folds = None
    if (family == "gaussian" and native_mod is not None
            and native_mod.get_lib() is not None
            and hasattr(native_mod.get_lib(), "cd_gaussian_gram_path")
            and n >= 4 * p):
        S_full = Xs.T @ Xs
        sum_full = Xs.sum(axis=0)
        xty_full = Xs.T @ y
        ysum_full = y.sum()
        gram_folds = []
        for k in range(K):
            vmask = folds == k
            Xv = Xs[vmask]
            yv = y[vmask]
            nv = len(yv)
            ntr = n - nv
            Sv = Xv.T @ Xv
            sv = Xv.sum(axis=0)
            xvy = Xv.T @ yv
            gram_folds.append(dict(
                G=(S_full - Sv) / ntr, xty=(xty_full - xvy) / ntr,
                c=(sum_full - sv) / ntr, ybar=(ysum_full - yv.sum()) / ntr,
                Gval=Sv / nv, xvty=xvy / nv, cv=sv / nv,
                yvbar=yv.mean(), yv2=float(yv @ yv) / nv))

    def fit_fold_gram(k, lambdas, alpha):
        f = gram_folds[k]
        return native_mod.cd_gram_path(
            f["G"], f["xty"], f["c"], f["ybar"], lambdas, alpha,
            f["Gval"], f["xvty"], f["cv"], f["yvbar"], f["yv2"],
            n_abort, tol, maxit)

    from concurrent.futures import ThreadPoolExecutor

    results = {}
    for alpha in alphas:
        lambdas = np.exp(np.linspace(
            np.log(lam_max / max(alpha, 1e-3)),
            np.log(lam_max / max(alpha, 1e-3) * lambda_min_ratio), nlambda))
        with ThreadPoolExecutor(max_workers=min(K, os.cpu_count() or 1)) \
                as pool:
            if gram_folds is not None:
                fits = list(pool.map(
                    lambda k: fit_fold_gram(k, lambdas, alpha), range(K)))
            else:
                fits = list(pool.map(
                    lambda k: fit_fold(Xs[folds != k], y[folds != k],
                                       lambdas, alpha, Xs[folds == k],
                                       y[folds == k]),
                    range(K)))
        fold_betas, fold_ints, fold_losses = [], [], []
        for loss, beta, intercept, _ in fits:
            if beta is None:
                beta, intercept = np.zeros(p), 0.0
            fold_betas.append(beta)
            fold_ints.append(intercept)
            fold_losses.append(loss)
        results[alpha] = (np.mean(fold_losses), np.mean(fold_betas, axis=0),
                          np.mean(fold_ints), np.asarray(fold_losses))

    best_alpha = min(results, key=lambda a: results[a][0])
    _, beta_s, int_s, losses = results[best_alpha]
    # back to original scale
    beta = beta_s / sd
    intercept = float(int_s - (mu / sd) @ beta_s)
    if family == "gaussian":
        intercept += y.mean() * 0  # means handled inside path fits
    return SpRegModel(beta=beta, intercept=intercept, family=family,
                      alpha=best_alpha, fold_losses=losses)


big_spLinReg = lambda X, y, **kw: big_spReg(X, y, family="gaussian", **kw)
big_spLogReg = lambda X, y, **kw: big_spReg(X, y, family="binomial", **kw)
