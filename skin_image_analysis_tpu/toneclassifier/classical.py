"""Classical modal-ITA tone classifiers.

Parity with notebooks/ToneClassifier/colourmapclassifier.ipynb (cells
19-24): a single modal-ITA feature per image fed to simple classifiers
(LinearSVC etc. there; sklearn is not available here, so the equivalents
are a 1-D threshold search and a jax-fit logistic regression — for one
scalar feature these span the same hypothesis class). The notebook's
observed ceiling is the class-imbalance rate 3063/3685 ≈ 0.831.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class ModalItaClassifier:
    """Binary tone from modal ITA: light(0) if ita >= threshold.

    mode='threshold': exhaustive best-accuracy threshold (decision stump).
    mode='logistic': gradient-fit logistic regression returning calibrated
    probabilities. mode='svm': the notebook's LinearSVC equivalent —
    hinge loss + L2 penalty (sklearn LinearSVC's default objective,
    C=1.0), gradient-fit (colourmapclassifier.ipynb cells 19-24).
    """

    def __init__(self, mode: str = "threshold"):
        if mode not in ("threshold", "logistic", "svm"):
            raise ValueError(mode)
        self.mode = mode
        self.threshold_: float | None = None
        self.coef_: tuple[float, float] | None = None

    def fit(self, modal_ita: np.ndarray, tone: np.ndarray) -> "ModalItaClassifier":
        """tone: 0=light, 1=dark. NaN features are dropped for fitting."""
        x = np.asarray(modal_ita, np.float64)
        y = np.asarray(tone, np.int32)
        ok = ~np.isnan(x)
        x, y = x[ok], y[ok]
        if self.mode == "threshold":
            candidates = np.unique(x)
            best_acc, best_t = -1.0, 0.0
            for t in candidates:
                acc = float(np.mean((x < t).astype(np.int32) == y))
                if acc > best_acc:
                    best_acc, best_t = acc, float(t)
            self.threshold_ = best_t
        elif self.mode == "svm":
            # LinearSVC objective on the single standardized feature:
            # mean hinge loss + (1/(2*C*n))*||w||², labels in {-1,+1}
            # (+1 = dark = low ITA, so the margin is on -x)
            mu, sd = float(x.mean()), float(x.std() or 1.0)
            xs = (x - mu) / sd
            yj = jnp.asarray(2 * y - 1, jnp.float32)
            xj = jnp.asarray(-xs, jnp.float32)
            n = float(len(x))
            c_reg = 1.0  # sklearn LinearSVC default C

            def loss(wb):
                w, b = wb
                margins = yj * (w * xj + b)
                hinge = jnp.mean(jnp.maximum(0.0, 1.0 - margins))
                return hinge + (w * w) / (2.0 * c_reg * n)

            grad = jax.jit(jax.grad(loss))
            wb = jnp.asarray([1.0, 0.0])
            for _ in range(2000):
                wb = wb - 0.05 * grad(wb)
            # fold the standardization back into predict()'s convention
            # (dark ⇔ w_raw*x + b_raw <= 0): dark was trained as
            # w*(-(x-mu)/sd) + b >= 0  ⇔  (w/sd)x - w*mu/sd - b <= 0
            w, b = float(wb[0]), float(wb[1])
            self.coef_ = (w / sd, -w * mu / sd - b)
        else:
            w0, b0 = 0.0, 0.0
            xj, yj = jnp.asarray(x), jnp.asarray(y, jnp.float32)

            def loss(wb):
                w, b = wb
                logits = -(w * xj + b)  # dark likelihood grows as ita falls
                p = jax.nn.sigmoid(logits)
                eps = 1e-7
                return -jnp.mean(
                    yj * jnp.log(p + eps) + (1 - yj) * jnp.log(1 - p + eps)
                )

            grad = jax.jit(jax.grad(loss))
            wb = jnp.asarray([w0, b0])
            for _ in range(500):
                wb = wb - 0.1 * grad(wb)
            self.coef_ = (float(wb[0]), float(wb[1]))
        return self

    def predict(self, modal_ita: np.ndarray) -> np.ndarray:
        """NaN features predict the majority-ish dark class 1."""
        x = np.asarray(modal_ita, np.float64)
        if self.mode == "threshold":
            if self.threshold_ is None:
                raise RuntimeError("fit first")
            out = (x < self.threshold_).astype(np.int32)
        else:
            if self.coef_ is None:
                raise RuntimeError("fit first")
            w, b = self.coef_
            out = (1.0 / (1.0 + np.exp(w * x + b)) >= 0.5).astype(np.int32)
        return np.where(np.isnan(x), 1, out)

    def score(self, modal_ita: np.ndarray, tone: np.ndarray) -> float:
        return float(np.mean(self.predict(modal_ita) == np.asarray(tone)))
