"""Linear models over feature-array columns: exact one-pass ridge
regression and distributed logistic regression, with pure-expression
scoring.

Why this belongs in a training-data engine: the corpus stack's quality
filters are models -- nb_log_odds (operators/corpus.py) is the
GENERATIVE fastText-shape filter, and the standard production pairing
is a DISCRIMINATIVE linear head over the same hashed/embedded features
(the CCNet/fastText quality-classifier shape, trained on
good-vs-crawl labels). These fits produce that head without leaving
the engine, and scoring is a Column expression any registered query
can compose.

Scale design (100 TB):
- ``ridge_fit`` is ONE pass, zero shuffles: per-Arrow-batch numpy
  partials of (n, X^T X, X^T y) fold on the driver (the
  reduction.gram_moments / knn_arrow precedent), then a d x d solve --
  driver-side by design, like every published distributed linear
  solver at modest d (MLlib's own normal-equation path).
- ``logreg_fit`` is gradient descent: ONE full pass per iteration
  computing (mean gradient, mean loss) as per-batch numpy partials --
  no shuffle, bounded driver fold of #batches x (d+2) doubles; the
  input projection is persisted once so iterations re-read cached
  columns, not the source. Steps use Armijo-style halving (an extra
  pass only when the loss fails to drop), so a too-large ``lr``
  degrades to extra passes, never divergence.
- Scoring (``score_expr`` / ``prob_expr``) rides the model into the
  plan as ONE literal array (vectors.lit_matrix's single-node form):
  whole-stage codegen at scan speed, nothing broadcast, nothing
  shuffled -- and the sequential fold is bit-equal to DuckDB's
  list_dot_product, so scored outputs are oracle-checkable (the
  pca_apply precedent; fits are numpy-replica-checked like
  kmeans/pca_fit).

No reference analogue (the reference has no model fitting; its
closest cousin is JobService.java:88-110's global-mean imputation --
a degenerate intercept-only fit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.functions import vectors


def _xy_partials(df: DataFrame, vec_col: str, label_col: str):
    """Per-Arrow-batch (n, X^T X, X^T y, sum y, sum y^2) partials of
    the intercept-augmented design matrix; bounded driver collect."""
    import numpy as np
    import pandas as pd

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            y = pdf["_y"].to_numpy().astype(np.float64)
            m1 = np.hstack([m, np.ones((len(m), 1))])
            yield pd.DataFrame(
                {
                    "n": [len(m)],
                    "g": [(m1.T @ m1).ravel()],
                    "xy": [m1.T @ y],
                    "sy": [float(y.sum())],
                    "syy": [float((y * y).sum())],
                }
            )

    parts = (
        df.select(
            vectors.as_double(vec_col).alias("_v"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
        .mapInPandas(
            partial,
            "n long, g array<double>, xy array<double>, "
            "sy double, syy double",
        )
        .collect()
    )
    if not parts:
        raise ValueError("no rows with non-null features and label")
    import numpy as np

    n = sum(p.n for p in parts)
    d1 = len(parts[0].xy)
    g = np.sum([np.asarray(p.g).reshape(d1, d1) for p in parts], axis=0)
    xy = np.sum([np.asarray(p.xy) for p in parts], axis=0)
    sy = float(sum(p.sy for p in parts))
    syy = float(sum(p.syy for p in parts))
    return n, g, xy, sy, syy


def ridge_fit(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    l2: float = 0.0,
    fit_intercept: bool = True,
) -> dict:
    """Exact ridge regression (ordinary least squares at l2=0) of a
    double label on an array feature column, via the normal equations
    (X^T X + l2*I) w = X^T y over intercept-augmented X -- the
    intercept is never penalized. One distributed pass (see module
    docstring), O(d^2) driver memory, O(d^3) driver solve.

    Returns {"weights": list[d], "intercept": float, "n": int,
    "r2": float, "l2": float}; r2 is computed from the same one-pass
    moments (1 - SSE/SST via the closed form), no second pass."""
    import numpy as np

    if l2 < 0:
        raise ValueError("l2 must be >= 0")
    n, g, xy, sy, syy = _xy_partials(df, vec_col, label_col)
    d1 = g.shape[0]
    a = g.copy()
    reg = np.eye(d1) * float(l2)
    reg[-1, -1] = 0.0  # intercept unpenalized
    a += reg
    if not fit_intercept:
        a = a[:-1, :-1]
        xy_eff = xy[:-1]
    else:
        xy_eff = xy
    w = np.linalg.solve(a, xy_eff)
    if fit_intercept:
        weights, intercept = w[:-1], float(w[-1])
    else:
        weights, intercept = w, 0.0
    # SSE = y'y - 2 w'X'y + w'X'Xw, SST about the mean (or raw when
    # no intercept -- the standard convention)
    full_w = np.append(weights, intercept)
    sse = syy - 2.0 * full_w @ xy + full_w @ g @ full_w
    sst = syy - (sy * sy) / n if fit_intercept else syy
    r2 = float(1.0 - sse / sst) if sst > 0 else float("nan")
    return {
        "weights": [float(x) for x in weights],
        "intercept": intercept,
        "n": int(n),
        "r2": r2,
        "l2": float(l2),
    }


def logreg_fit(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    iters: int = 25,
    lr: float = 1.0,
    l2: float = 0.0,
    tol: float = 1e-8,
) -> dict:
    """Binary logistic regression by full-batch gradient descent with
    Armijo-style halving: one distributed (mean gradient, mean loss)
    fold per pass (see module docstring), driver-side step. Labels
    must be 0/1 doubles; features should be standardized
    (features.standardize_apply) for the default ``lr`` to be a good
    step -- a hot ``lr`` costs extra halving passes, never divergence.
    Stops early when the loss improvement falls below ``tol``.

    Returns {"weights": list[d], "intercept": float, "n": int,
    "loss": list (per accepted step, starting with the w=0 loss),
    "l2": float}. Test-only by design (iterative, the kmeans/pca_fit
    precedent): numpy replica equality in tests/test_linear.py."""
    import numpy as np

    if iters < 1:
        raise ValueError("iters must be >= 1")
    if lr <= 0:
        raise ValueError("lr must be > 0")
    if l2 < 0:
        raise ValueError("l2 must be >= 0")
    base = (
        df.select(
            vectors.as_double(vec_col).alias("_v"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
        .persist()
    )
    try:

        def grad_loss(w):
            import pandas as pd

            def partial(batches, w=w):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                    y = pdf["_y"].to_numpy().astype(np.float64)
                    z = m @ w[:-1] + w[-1]
                    p = 1.0 / (1.0 + np.exp(-z))
                    resid = p - y
                    g = np.append(m.T @ resid, resid.sum())
                    # log(1+e^z) - y z, stable via logaddexp
                    loss = float((np.logaddexp(0.0, z) - y * z).sum())
                    yield pd.DataFrame(
                        {"n": [len(m)], "g": [g], "loss": [loss]}
                    )

            parts = base.mapInPandas(
                partial, "n long, g array<double>, loss double"
            ).collect()
            if not parts:
                raise ValueError(
                    "no rows with non-null features and label"
                )
            n = sum(p.n for p in parts)
            g = np.sum([np.asarray(p.g) for p in parts], axis=0) / n
            loss = sum(p.loss for p in parts) / n
            # l2 on weights only, never the intercept
            g[:-1] += l2 * w[:-1]
            loss += 0.5 * l2 * float(w[:-1] @ w[:-1])
            return n, g, loss

        first = base.first()
        if first is None:
            raise ValueError("no rows with non-null features and label")
        d = len(first["_v"])
        w = np.zeros(d + 1)
        n, g, loss = grad_loss(w)
        history = [loss]
        step = float(lr)
        for _ in range(iters):
            while True:
                cand = w - step * g
                _, g2, loss2 = grad_loss(cand)
                if loss2 <= loss or step < 1e-12:
                    break
                step *= 0.5  # Armijo-lite: retry from the same w
            if abs(loss - loss2) < tol:
                w, loss = cand, loss2
                history.append(loss2)
                break
            w, g, loss = cand, g2, loss2
            history.append(loss2)
        return {
            "weights": [float(x) for x in w[:-1]],
            "intercept": float(w[-1]),
            "n": int(n),
            "loss": [float(x) for x in history],
            "l2": float(l2),
        }
    finally:
        base.unpersist()


def score_expr(model: dict, vec_col: Column | str) -> Column:
    """Linear score w . x + b as a pure Column expression: the model
    rides in as one literal array (vectors.dot's sequential fold --
    bit-equal to DuckDB list_dot_product, so scored outputs oracle).
    Works for both fits (ridge prediction / logreg logit)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    w = vectors.lit_vector(model["weights"])
    return vectors.dot(vectors.as_double(c), w) + F.lit(
        float(model["intercept"])
    )


def prob_expr(model: dict, vec_col: Column | str) -> Column:
    """Logistic probability sigmoid(score) as a pure expression."""
    s = score_expr(model, vec_col)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-s))


def quantile_fit(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    tau: float = 0.5,
    iters: int = 40,
    lr: float = 1.0,
    l2: float = 0.0,
    tol: float = 1e-9,
) -> dict:
    """Linear quantile regression (Koenker-Bassett pinball loss) by
    the same full-batch GD harness as ``logreg_fit``: the conditional
    tau-quantile model that turns a point forecast into calibrated
    bands (fit tau = 0.1/0.5/0.9 for a P10/P50/P90 envelope -- the
    parametric cousin of ``conformal_interval``'s distribution-free
    band, useful when the band must EXTRAPOLATE with features).

    Pinball loss rho_tau(r) = r*(tau - 1{r<0}) with r = y - w.x - b;
    subgradient wrt w is -(tau - 1{r<0})*x, folded exactly like
    logreg's (mean gradient, mean loss) one pass per step, Armijo
    halving plus step RE-GROWTH after accepted steps (doubling back
    toward ``lr``) -- a subgradient method needs steps that adapt both
    ways or it stalls at the first halving. The loss is
    piecewise-linear, so GD oscillates near the optimum rather than
    converging tightly -- ``tol`` stops on loss plateau; for exact
    solutions at small n use an LP solver offline, this operator
    targets corpus-scale approximate fits (the band direction and
    separation converge long before the last decimal of the slope).

    Returns the same dict shape as logreg_fit. Test-only by design
    (iterative; numpy replica + quantile-recovery pins in
    tests/test_linear.py); scoring rides ``score_expr``."""
    import numpy as np

    if not 0 < tau < 1:
        raise ValueError("tau must be in (0, 1)")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if lr <= 0:
        raise ValueError("lr must be > 0")
    if l2 < 0:
        raise ValueError("l2 must be >= 0")
    base = (
        df.select(
            vectors.as_double(vec_col).alias("_v"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
        .persist()
    )
    try:

        def grad_loss(w):
            import pandas as pd

            def partial(batches, w=w):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                    y = pdf["_y"].to_numpy().astype(np.float64)
                    r = y - (m @ w[:-1] + w[-1])
                    s = tau - (r < 0).astype(np.float64)
                    g = np.append(m.T @ (-s), -s.sum())
                    loss = float((r * s).sum())
                    yield pd.DataFrame(
                        {"n": [len(m)], "g": [g], "loss": [loss]}
                    )

            parts = base.mapInPandas(
                partial, "n long, g array<double>, loss double"
            ).collect()
            if not parts:
                raise ValueError(
                    "no rows with non-null features and label"
                )
            n = sum(p.n for p in parts)
            g = np.sum([np.asarray(p.g) for p in parts], axis=0) / n
            loss = sum(p.loss for p in parts) / n
            g[:-1] += l2 * w[:-1]
            loss += 0.5 * l2 * float(w[:-1] @ w[:-1])
            return n, g, loss

        first = base.first()
        if first is None:
            raise ValueError("no rows with non-null features and label")
        d = len(first["_v"])
        w = np.zeros(d + 1)
        n, g, loss = grad_loss(w)
        history = [loss]
        step = float(lr)
        for _ in range(iters):
            while True:
                cand = w - step * g
                _, g2, loss2 = grad_loss(cand)
                if loss2 <= loss or step < 1e-12:
                    break
                step *= 0.5
            if abs(loss - loss2) < tol:
                w, loss = cand, loss2
                history.append(loss2)
                break
            w, g, loss = cand, g2, loss2
            history.append(loss2)
            step = min(step * 2.0, float(lr))  # re-grow after accept
        return {
            "weights": [float(x) for x in w[:-1]],
            "intercept": float(w[-1]),
            "n": int(n),
            "loss": [float(x) for x in history],
            "l2": float(l2),
            "tau": float(tau),
        }
    finally:
        base.unpersist()


def ipw_ate(
    df: DataFrame,
    model: dict,
    treat_col: str,
    y_col: str,
    vec_col: str,
    clip: float = 0.05,
    keys: "list[str] | None" = None,
    digits: int = 6,
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect -- the
    observational-data causal readout that completes the experiment
    set (diff_in_diff handles parallel-trends designs, cuped_adjust
    randomized ones; IPW handles confounded treatment assignment with
    measured covariates): weight each unit by 1/P(its own arm | x)
    using a fitted propensity ``model`` (logreg_fit on treatment vs
    features), then the Horvitz-Thompson arm means difference
    estimates the ATE.

    Propensities CLIP to [clip, 1-clip] (the standard positivity
    guard: a unit with e(x) ~ 0 would dominate the estimate with
    unbounded weight). Emitted per key slice: n per arm, weighted
    means, ate = mu1 - mu0, plus the effective sample sizes
    (Kish: (sum w)^2 / sum w^2) that tell you how much data the
    weighting really left you -- an honest-variance readout without
    pretending to a closed-form SE (bootstrap_ci over the weighted
    frame is the companion).

    Scale shape: scoring is a pure expression (the model rides in as
    ONE literal array -- score_expr), the readout ONE hash agg of
    conditional sibling aggregates; with a PINNED literal model the
    whole operator is DuckDB-replayable exactly (the scoring-parity
    precedent), which the test does."""
    if not 0 <= clip < 0.5:
        raise ValueError("clip must be in [0, 0.5)")
    ks = list(keys or [])
    e = prob_expr(model, vec_col)
    e = F.least(F.greatest(e, F.lit(float(clip))), F.lit(1.0 - clip))
    t = F.col(treat_col).cast("double")
    y = F.col(y_col).cast("double")
    w = t / e + (F.lit(1.0) - t) / (F.lit(1.0) - e)
    base = df.filter(
        F.col(treat_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *ks, t.alias("_t"), y.alias("_y"), w.alias("_w")
    )
    tt = F.col("_t")
    ww = F.col("_w")
    yy = F.col("_y")
    g = base.groupBy(*ks).agg(
        F.count(F.when(tt == 1.0, 1)).alias("n_treat"),
        F.count(F.when(tt == 0.0, 1)).alias("n_control"),
        F.sum(F.when(tt == 1.0, ww * yy)).alias("_swy1"),
        F.sum(F.when(tt == 1.0, ww)).alias("_sw1"),
        F.sum(F.when(tt == 1.0, ww * ww)).alias("_sww1"),
        F.sum(F.when(tt == 0.0, ww * yy)).alias("_swy0"),
        F.sum(F.when(tt == 0.0, ww)).alias("_sw0"),
        F.sum(F.when(tt == 0.0, ww * ww)).alias("_sww0"),
    )
    from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
        stable_round,
    )

    mu1 = F.col("_swy1") / F.col("_sw1")
    mu0 = F.col("_swy0") / F.col("_sw0")
    return g.select(
        *ks,
        "n_treat",
        "n_control",
        stable_round(mu1, digits).alias("mu_treat"),
        stable_round(mu0, digits).alias("mu_control"),
        stable_round(mu1 - mu0, digits).alias("ate"),
        stable_round(
            F.col("_sw1") ** 2 / F.col("_sww1"), digits
        ).alias("ess_treat"),
        stable_round(
            F.col("_sw0") ** 2 / F.col("_sww0"), digits
        ).alias("ess_control"),
    )


def aipw_ate(
    df: DataFrame,
    propensity_model: dict,
    outcome_model_treat: dict,
    outcome_model_control: dict,
    treat_col: str,
    y_col: str,
    vec_col: str,
    clip: float = 0.05,
    keys: "list[str] | None" = None,
    digits: int = 6,
) -> DataFrame:
    """Doubly-robust AIPW treatment effect (Robins-Rotnitzky-Zhao):
    per unit, psi = m1(x) - m0(x) + t*(y - m1(x))/e(x)
    - (1-t)*(y - m0(x))/(1 - e(x)), and ATE = mean(psi). Consistent
    when EITHER the propensity model OR the outcome models are right
    -- the property the test pins from both directions (each nuisance
    deliberately broken in turn). Fit the nuisances with logreg_fit
    (propensity) and per-arm ridge_fit (outcomes); all three ride in
    as literal arrays.

    Same scale shape as ipw_ate: three pure-expression scores + ONE
    hash agg of psi's mean/variance per key slice; with pinned models
    the whole readout replays exactly in DuckDB. The psi variance /
    n gives the standard AIPW large-sample SE -- emitted as se so the
    readout is a confidence statement, not just a point."""
    if not 0 <= clip < 0.5:
        raise ValueError("clip must be in [0, 0.5)")
    ks = list(keys or [])
    e = prob_expr(propensity_model, vec_col)
    e = F.least(F.greatest(e, F.lit(float(clip))), F.lit(1.0 - clip))
    m1 = score_expr(outcome_model_treat, vec_col)
    m0 = score_expr(outcome_model_control, vec_col)
    t = F.col(treat_col).cast("double")
    y = F.col(y_col).cast("double")
    psi = (
        m1
        - m0
        + t * (y - m1) / e
        - (F.lit(1.0) - t) * (y - m0) / (F.lit(1.0) - e)
    )
    base = df.filter(
        F.col(treat_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*ks, psi.alias("_psi"))
    from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
        stable_round,
    )

    g = base.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("_psi").alias("_ate"),
        F.var_samp("_psi").alias("_var"),
    )
    return g.select(
        *ks,
        "n",
        stable_round(F.col("_ate"), digits).alias("ate"),
        stable_round(
            F.sqrt(F.col("_var") / F.col("n")), digits
        ).alias("se"),
    )

