"""Tree-structured Parzen Estimator (TPE) sampler — no external dependency.

The reference sweeps hyperparameters with Hydra's optuna sweeper configured
for TPE (configs/config_*.yaml `hydra.sweeper` blocks: tpe sampler, 15
trials, direction minimize). optuna is not installed in this image, so this
module provides the classic TPE algorithm (Bergstra et al., "Algorithms for
Hyper-Parameter Optimization", NeurIPS 2011) for sweep.py / run.py
--multirun:

  * split observed trials into "good" (best gamma-quantile) and "bad";
  * fit Parzen mixtures l(x) over good and g(x) over bad points
    (truncated normals for numeric params, smoothed categoricals for
    choices);
  * draw candidates from l and keep the one maximizing l(x)/g(x).

Supported dimensions: uniform(lo, hi), loguniform(lo, hi), int(lo, hi),
choice(options). The public surface mirrors the ask/tell pattern:

    sampler = TPESampler(space, seed=0)
    for _ in range(n_trials):
        params = sampler.suggest()
        sampler.tell(params, objective(params))
"""
from __future__ import annotations

import math
import random
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np


class TPESampler:
    def __init__(self, space: Dict[str, Tuple], seed: int = 0,
                 gamma: float = 0.25, n_startup: int = 5,
                 n_candidates: int = 24, explore_prob: float = 0.1):
        """space: {name: ("uniform"|"loguniform"|"int", lo, hi) or
        ("choice", [options])}. explore_prob: probability of a pure random
        suggestion after startup — keeps the sampler from locking onto a
        deceptive early good/bad split (TPE candidates otherwise only come
        from the good-region Parzen mixture)."""
        self.space = space
        self.rng = random.Random(seed)
        self.np_rng = np.random.default_rng(seed)
        self.gamma = gamma
        self.n_startup = n_startup
        self.n_candidates = n_candidates
        self.explore_prob = explore_prob
        self.history: List[Tuple[Dict[str, Any], float]] = []

    # ------------------------------------------------------------------ api

    def suggest(self) -> Dict[str, Any]:
        if (len(self.history) < self.n_startup
                or self.rng.random() < self.explore_prob):
            return {k: self._random(spec) for k, spec in self.space.items()}
        good, bad = self._split()
        return {k: self._suggest_dim(k, spec, good, bad)
                for k, spec in self.space.items()}

    def tell(self, params: Dict[str, Any], value: float) -> None:
        if not math.isfinite(value):
            value = float("inf")
        self.history.append((dict(params), float(value)))

    @property
    def best(self) -> Tuple[Dict[str, Any], float]:
        params, value = min(self.history, key=lambda r: r[1])
        return params, value

    # ------------------------------------------------------------ internals

    def _random(self, spec):
        kind = spec[0]
        if kind == "uniform":
            return self.rng.uniform(spec[1], spec[2])
        if kind == "loguniform":
            return math.exp(self.rng.uniform(math.log(spec[1]),
                                             math.log(spec[2])))
        if kind == "int":
            return self.rng.randint(int(spec[1]), int(spec[2]))
        if kind == "choice":
            return self.rng.choice(list(spec[1]))
        raise ValueError(f"unknown dimension kind {kind!r}")

    def _split(self):
        ordered = sorted(self.history, key=lambda r: r[1])
        # sharper-than-gamma cap as n grows (optuna uses ceil(0.1 n)): the
        # good set must shrink relative to n for l(x) to keep refining
        n_good = max(1, min(int(math.ceil(self.gamma * len(ordered))),
                            int(math.ceil(0.1 * len(ordered))) + 1))
        return ordered[:n_good], ordered[n_good:]

    def _to_internal(self, spec, v):
        if spec[0] == "loguniform":
            return math.log(v)
        return float(v)

    def _bounds(self, spec):
        if spec[0] == "loguniform":
            return math.log(spec[1]), math.log(spec[2])
        return float(spec[1]), float(spec[2])

    def _suggest_dim(self, key, spec, good, bad):
        if spec[0] == "choice":
            return self._suggest_choice(key, spec[1], good, bad)
        lo, hi = self._bounds(spec)
        g_pts = np.asarray([self._to_internal(spec, p[0][key]) for p in good])
        b_pts = np.asarray([self._to_internal(spec, p[0][key]) for p in bad])

        cands = self._sample_parzen(g_pts, lo, hi, self.n_candidates)
        score = (self._log_parzen(cands, g_pts, lo, hi)
                 - self._log_parzen(cands, b_pts, lo, hi))
        x = float(cands[int(np.argmax(score))])
        if spec[0] == "loguniform":
            x = math.exp(x)
            return min(max(x, spec[1]), spec[2])
        if spec[0] == "int":
            return int(min(max(round(x), int(spec[1])), int(spec[2])))
        return min(max(x, spec[1]), spec[2])

    def _bandwidths(self, pts, lo, hi):
        """Per-point adaptive bandwidths (hyperopt heuristic): each kernel's
        width is the larger gap to its sorted neighbors, so l(x) sharpens
        where good points cluster and stays broad where they are sparse."""
        n = len(pts)
        if n == 0:
            return np.zeros(0)
        if n == 1:
            return np.asarray([max((hi - lo) / 4.0, 1e-12)])
        order = np.argsort(pts)
        srt = np.asarray(pts)[order]
        gaps = np.diff(srt)
        left = np.concatenate([[gaps[0]], gaps])
        right = np.concatenate([gaps, [gaps[-1]]])
        bw_sorted = np.clip(np.maximum(left, right), (hi - lo) / 100.0,
                            hi - lo)
        bw = np.empty(n)
        bw[order] = bw_sorted
        return np.maximum(bw, 1e-12)

    def _sample_parzen(self, pts, lo, hi, n):
        """Draw n candidates from the good-points Parzen mixture (plus a
        uniform prior component), truncated to [lo, hi]."""
        out = np.empty(n)
        bws = self._bandwidths(pts, lo, hi)
        for i in range(n):
            if len(pts) == 0 or self.rng.random() < 1.0 / (len(pts) + 1):
                out[i] = self.rng.uniform(lo, hi)  # prior component
            else:
                j = self.rng.randrange(len(pts))
                for _ in range(16):  # rejection-truncate to the box
                    x = self.np_rng.normal(pts[j], bws[j])
                    if lo <= x <= hi:
                        break
                else:
                    x = self.rng.uniform(lo, hi)
                out[i] = x
        return out

    def _log_parzen(self, xs, pts, lo, hi):
        """log density of the Parzen mixture (with uniform prior component)
        at each x."""
        prior = 1.0 / max(hi - lo, 1e-12)
        if len(pts) == 0:
            return np.full(len(xs), math.log(prior))
        bws = self._bandwidths(pts, lo, hi)
        z = (xs[:, None] - np.asarray(pts)[None, :]) / bws[None, :]
        comp = np.exp(-0.5 * z * z) / (bws[None, :] * math.sqrt(2 * math.pi))
        dens = (comp.sum(axis=1) + prior) / (len(pts) + 1)
        return np.log(np.maximum(dens, 1e-300))

    def _suggest_choice(self, key, options, good, bad):
        options = list(options)

        def weights(trials):
            w = np.ones(len(options))  # +1 smoothing prior
            for params, _ in trials:
                w[options.index(params[key])] += 1.0
            return w / w.sum()

        wg, wb = weights(good), weights(bad)
        idx = [self.np_rng.choice(len(options), p=wg)
               for _ in range(self.n_candidates)]
        score = np.log(wg[idx]) - np.log(wb[idx])
        return options[idx[int(np.argmax(score))]]
