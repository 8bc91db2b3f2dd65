"""Model-accuracy / residual-evaluation kernels (pure numpy).

Behavioral parity layer with the reference evaluate suite
(``/root/reference/transformio/accuracy.py``).  These run on the
driver (GCP sets are tiny); the Spark layer parallelizes the
embarrassingly-parallel inner loops (leave-one-out refits, candidate
drops) via ``applyInPandas`` when asked to, with bit-identical
results because both paths call these same functions.

Parity-critical semantics preserved:

- geodesic distance is haversine with EARTH RADIUS 6367 km — not
  6371 (accuracy.py:35); argument order is (pred, obs)
  (accuracy.py:37).
- ``residuals`` RE-FITS the transform on all points before
  predicting (accuracy.py:47) — the re-fit is observable.
- ``loo_residuals`` removes points by VALUE (``list.remove``
  semantics — first equal value wins, accuracy.py:68-71).
- RMSE/MAE/MAX filter NaN/Inf BEFORE the denominator
  (accuracy.py:268-284); RMSE/MAE of an all-NaN vector divide 0/0
  and return nan with a RuntimeWarning, MAX raises ValueError —
  same as the reference.
- ``drop_worst_model`` keeps the drop with the lowest error using a
  STABLE sort (Python ``sorted``), so ties break on original GCP
  order (accuracy.py:129).
- ``auto_drop_models`` stop rule: relative improvement
  ``(err - prev)/prev > -improvement_ratio`` breaks the loop
  (accuracy.py:175-179); effective minpoints is
  ``max(minpoints, trans.minpoints)`` (accuracy.py:150-151); the
  kept point set is re-fitted before returning (accuracy.py:183-187).
- ``auto_choose_model`` hardcodes leave_one_out=True for
  cross-model comparability (accuracy.py:203-207), silently skips
  candidates raising InsufficientTransformPoints (218-219), returns
  None when nothing fits (221-223), stable-sorts by error (226-228).

The uniform result record is the reference's 6-tuple
``(trans, inpoints, outpoints, predicted, resids, err)``.
"""

from __future__ import annotations

import math

import numpy as np

from .transforms import InsufficientTransformPoints

__all__ = [
    "distances",
    "residuals",
    "loo_residuals",
    "model_accuracy",
    "drop_worst_model",
    "auto_drop_models",
    "auto_choose_model",
    "RMSE",
    "MAE",
    "MAX",
    "EARTH_RADIUS_KM",
]

# PARITY: the reference's haversine uses R=6367 km (accuracy.py:35).
EARTH_RADIUS_KM = 6367.0


def haversine_km(lon1, lat1, lon2, lat2):
    """Vectorized haversine great-circle distance in km, identical
    formulation to accuracy.py:22-36 (R=6367, arcsin form)."""
    lon1, lat1, lon2, lat2 = map(np.radians, [lon1, lat1, lon2, lat2])
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return EARTH_RADIUS_KM * (2 * np.arcsin(np.sqrt(a)))


def distances(obsx, obsy, predx, predy, metric="euclidean"):
    obsx, obsy = np.array(obsx), np.array(obsy)
    predx, predy = np.array(predx), np.array(predy)
    if metric == "euclidean":
        return np.sqrt((predx - obsx) ** 2 + (predy - obsy) ** 2)
    if metric == "geodesic":
        # argument order (pred, obs) matches accuracy.py:37
        return haversine_km(predx, predy, obsx, obsy)
    raise ValueError(metric)


def residuals(transform, inpoints, outpoints, distance="euclidean"):
    inx, iny = zip(*inpoints)
    outx, outy = zip(*outpoints)
    # observable re-fit on all points (accuracy.py:47)
    transform.fit(inx, iny, outx, outy)
    predx, predy = transform.predict(inx, iny)
    resids = distances(outx, outy, predx, predy, distance)
    return list(zip(predx, predy)), resids


def loo_residuals(transform, inpoints, outpoints, distance="euclidean"):
    predpoints = []
    for inpoint, outpoint in zip(inpoints, outpoints):
        # remove-by-value, first equal value wins (accuracy.py:68-71)
        kept_in = list(inpoints)
        kept_in.remove(inpoint)
        kept_out = list(outpoints)
        kept_out.remove(outpoint)

        inx, iny = zip(*kept_in)
        outx, outy = zip(*kept_out)
        transform.fit(inx, iny, outx, outy)

        px, py = transform.predict([inpoint[0]], [inpoint[1]])
        predpoints.append((px[0], py[0]))

    predx, predy = zip(*predpoints)
    obsx, obsy = zip(*outpoints)
    resids = distances(obsx, obsy, predx, predy, distance)
    return predpoints, resids


_METRICS = {}


def model_accuracy(
    trans, inpoints, outpoints, leave_one_out=False, distance="euclidean", metric="rmse"
):
    resfunc = loo_residuals if leave_one_out else residuals
    predicted, resids = resfunc(trans, inpoints, outpoints, distance)
    err = _METRICS[metric.lower()](resids)
    return predicted, resids, err


def drop_worst_model(
    trans, inpoints, outpoints, leave_one_out=False, distance="euclidean", metric="rmse"
):
    inpoints = list(inpoints)
    outpoints = list(outpoints)
    trans = trans.copy()

    candidates = []
    for inp, outp in zip(inpoints, outpoints):
        kept_in = list(inpoints)
        kept_in.remove(inp)
        kept_out = list(outpoints)
        kept_out.remove(outp)
        predicted, resids, err = model_accuracy(
            trans, kept_in, kept_out,
            leave_one_out=leave_one_out, distance=distance, metric=metric,
        )
        candidates.append((inp, outp, predicted, resids, err))

    # stable sort on err → ties break on original GCP order
    # (accuracy.py:129)
    inp, outp, predicted, resids, err = sorted(candidates, key=lambda c: c[-1])[0]
    inpoints.remove(inp)
    outpoints.remove(outp)

    inx, iny = zip(*inpoints)
    outx, outy = zip(*outpoints)
    trans.fit(inx, iny, outx, outy)
    return trans, inpoints, outpoints, predicted, resids, err


def auto_drop_models(
    trans,
    inpoints,
    outpoints,
    improvement_ratio=0.10,
    minpoints=None,
    leave_one_out=False,
    distance="euclidean",
    metric="rmse",
    verbose=False,
):
    kept_in = list(inpoints)
    kept_out = list(outpoints)
    trans = trans.copy()

    minpoints = minpoints or trans.minpoints
    minpoints = max(minpoints, trans.minpoints)

    predicted, resids, err = model_accuracy(
        trans, kept_in, kept_out, leave_one_out, distance, metric
    )
    seq = [(trans, kept_in, kept_out, predicted, resids, err)]

    while len(kept_in) > minpoints:
        try:
            step = drop_worst_model(
                trans, kept_in, kept_out, leave_one_out, distance, metric
            )
        except InsufficientTransformPoints:
            break

        prev_err = seq[-1][-1]
        improvement = (step[-1] - prev_err) / float(prev_err)
        if improvement > -improvement_ratio:
            break  # no longer improving enough (accuracy.py:175-179)

        seq.append(step)
        _, kept_in, kept_out, _, _, _ = step

    trans, kept_in, kept_out, predicted, resids, err = seq[-1]
    inx, iny = zip(*kept_in)
    outx, outy = zip(*kept_out)
    trans.fit(inx, iny, outx, outy)
    return trans, kept_in, kept_out, predicted, resids, err


def auto_choose_model(inpoints, outpoints, transforms, refine_outliers=True, **kwargs):
    inpoints = list(inpoints)
    outpoints = list(outpoints)

    results = []
    for trans in transforms:
        try:
            if refine_outliers:
                # leave_one_out hardcoded for cross-model
                # comparability (accuracy.py:203-207)
                res = auto_drop_models(
                    trans, inpoints, outpoints, leave_one_out=True, **kwargs
                )
            else:
                predicted, resids, err = model_accuracy(
                    trans, inpoints, outpoints, leave_one_out=True, **kwargs
                )
                res = (trans, inpoints, outpoints, predicted, resids, err)
            results.append(res)
        except InsufficientTransformPoints:
            continue

    if not results:
        return None
    return sorted(results, key=lambda r: r[-1])[0]


def _valid(residuals_arr):
    residuals_arr = np.array(residuals_arr)
    bad = np.isnan(residuals_arr) | np.isinf(residuals_arr)
    return residuals_arr[~bad]


def RMSE(resids):
    r = _valid(resids)
    # all-NaN input → 0/0 → nan + RuntimeWarning, same as accuracy.py:272
    return math.sqrt((r ** 2).sum() / float(r.shape[0]))


def MAE(resids):
    r = _valid(resids)
    return abs(r).sum() / float(r.shape[0])


def MAX(resids):
    r = _valid(resids)
    return abs(r).max()


_METRICS.update({"rmse": RMSE, "mae": MAE, "max": MAX})
