"""Readout tests: scaler vs sklearn, logistic vs sklearn, metrics vs sklearn."""

import numpy as np
import jax.numpy as jnp
import pytest
import sklearn.linear_model
import sklearn.metrics
import sklearn.preprocessing

from lsm_tpu.readout import logistic, metrics, scaler


def _toy_classification(rng, n=400, d=20, k=4):
    centers = rng.standard_normal((k, d)) * 2.0
    y = rng.integers(0, k, size=n)
    x = centers[y] + rng.standard_normal((n, d))
    return x.astype(np.float32), y.astype(np.int32)


def test_scaler_matches_sklearn(rng):
    x = rng.standard_normal((50, 7)).astype(np.float32) * 3 + 1
    x[:, 3] = 2.5  # zero-variance column
    st = scaler.fit_scaler(jnp.asarray(x))
    ref = sklearn.preprocessing.StandardScaler().fit(x)
    np.testing.assert_allclose(np.asarray(st.mean), ref.mean_, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.scale), ref.scale_, rtol=1e-3, atol=1e-5)
    ours = np.asarray(scaler.transform(st, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transform(x), rtol=1e-3, atol=1e-4)


def test_scaler_from_moments_matches_direct(rng):
    x = rng.standard_normal((64, 5)).astype(np.float32)
    xj = jnp.asarray(x)
    direct = scaler.fit_scaler(xj)
    from_m = scaler.fit_scaler_from_moments(
        jnp.sum(xj, 0), jnp.sum(xj * xj, 0), jnp.asarray(64.0)
    )
    np.testing.assert_allclose(direct.mean, from_m.mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(direct.scale, from_m.scale, rtol=1e-4, atol=1e-5)


def test_logistic_matches_sklearn_accuracy(rng):
    x, y = _toy_classification(rng)
    x = sklearn.preprocessing.StandardScaler().fit_transform(x).astype(np.float32)
    params, iters = logistic.fit_logistic(
        jnp.asarray(x), jnp.asarray(y), num_classes=4, l2_c=1.0, max_iter=200
    )
    ours = np.asarray(logistic.predict(params, jnp.asarray(x)))
    ref = sklearn.linear_model.LogisticRegression(max_iter=1000, random_state=42)
    ref.fit(x, y)
    ref_pred = ref.predict(x)
    acc_ours = (ours == y).mean()
    acc_ref = (ref_pred == y).mean()
    assert int(iters) > 1
    # Same convex objective -> near-identical training accuracy.
    assert abs(acc_ours - acc_ref) < 0.02
    # And near-identical weights (convex problem, same regularization).
    w_ref = ref.coef_.T  # (D, K)
    np.testing.assert_allclose(np.asarray(params.w), w_ref, rtol=0.1, atol=0.05)


def test_ridge_separates_toy_data(rng):
    x, y = _toy_classification(rng, n=300)
    params = logistic.fit_ridge(jnp.asarray(x), jnp.asarray(y), num_classes=4)
    pred = np.asarray(logistic.predict(params, jnp.asarray(x)))
    assert (pred == y).mean() > 0.9


def test_metrics_match_sklearn(rng):
    y_true = rng.integers(0, 3, 100).astype(np.int32)
    y_pred = y_true.copy()
    flip = rng.random(100) < 0.3
    y_pred[flip] = rng.integers(0, 3, flip.sum())

    rep = metrics.classification_report(y_true, y_pred, ["a", "b", "c"])
    p, r, f, s = sklearn.metrics.precision_recall_fscore_support(
        y_true, y_pred, labels=[0, 1, 2], zero_division=0
    )
    np.testing.assert_allclose(rep.precision, p, rtol=1e-6)
    np.testing.assert_allclose(rep.recall, r, rtol=1e-6)
    np.testing.assert_allclose(rep.f1, f, rtol=1e-6)
    np.testing.assert_array_equal(rep.support, s)
    assert abs(rep.accuracy - sklearn.metrics.accuracy_score(y_true, y_pred)) < 1e-9
    text = rep.render()
    assert "precision" in text and "macro avg" in text


def test_confusion_matrix_totals(rng):
    y_true = rng.integers(0, 5, 64)
    y_pred = rng.integers(0, 5, 64)
    cm = np.asarray(
        metrics.confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), 5)
    )
    assert cm.sum() == 64
    for c in range(5):
        assert cm[c].sum() == (y_true == c).sum()


def test_scaler_large_mean_small_variance():
    """Catastrophic-cancellation regression: spike-time features live at
    O(100) bin indices; in f32 the one-pass E[x^2]-mean^2 variance gave
    scale 0.125 for a true std of 0.01 (12x off). The two-pass
    fit_scaler and the shifted moments path must both track a float64
    oracle."""
    import numpy as np

    r = np.random.default_rng(0)
    x = (390.0 + r.standard_normal((4096, 3)) * 0.01).astype(np.float32)
    true_std = x.astype(np.float64).std(axis=0)

    st = scaler.fit_scaler(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(st.scale), true_std, rtol=0.02)
    np.testing.assert_allclose(
        np.asarray(st.mean), x.astype(np.float64).mean(axis=0), rtol=1e-6
    )

    # Shifted-moments path (streaming fit / multi-chip train step).
    c = x[:64].mean(axis=0)
    d = (x - c).astype(np.float32)
    st2 = scaler.fit_scaler_from_moments(
        jnp.asarray(d.sum(axis=0)),
        jnp.asarray((d * d).sum(axis=0)),
        jnp.float32(x.shape[0]),
        shift=jnp.asarray(c),
    )
    np.testing.assert_allclose(np.asarray(st2.scale), true_std, rtol=0.02)
    np.testing.assert_allclose(
        np.asarray(st2.mean), x.astype(np.float64).mean(axis=0), rtol=1e-6
    )


def test_classification_report_rejects_out_of_range_labels():
    """OOB labels silently vanish from the one-hot confusion matrix,
    inflating accuracy over the survivors — must fail loudly instead."""
    import numpy as np
    import pytest

    from lsm_tpu.readout.metrics import classification_report

    with pytest.raises(ValueError, match="outside"):
        classification_report(
            np.array([0, 1, 2, 2]), np.array([0, 1, 2, 0]), ["a", "b"]
        )
    rep = classification_report(
        np.array([0, 1, 1, 0]), np.array([0, 1, 0, 0]), ["a", "b"]
    )
    assert rep.accuracy == 0.75
