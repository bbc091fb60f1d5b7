"""Sample-quality scorer: the classifier learns the dataset, real data
scores high, and degenerate (collapsed) samples score low on
diversity."""

import numpy as np

from generative_models_tpu.data.mnist import synthetic_mnist, to_flat_float
from generative_models_tpu.utils.quality import (
    classifier_accuracy,
    fid_score,
    score_samples,
    train_classifier,
)


def test_classifier_and_scores():
    arrs = to_flat_float(synthetic_mnist(2000, 400, seed=0))
    clf = train_classifier(arrs["x_train"], arrs["y_train"], steps=300)
    acc = classifier_accuracy(clf, arrs["x_test"], arrs["y_test"])
    assert acc > 0.9  # the procedural digits are easy

    real = score_samples(clf, arrs["x_test"])
    assert real["class_entropy"] > 2.0      # ~uniform over 10 classes
    assert real["is_score"] > 3.0

    # mode collapse: one image repeated
    collapsed = np.tile(arrs["x_test"][:1], (400, 1))
    col = score_samples(clf, collapsed)
    assert col["class_entropy"] < 0.5
    assert col["is_score"] < 1.5
    # noise: low confidence
    rng = np.random.default_rng(0)
    noise = rng.random((400, 784), dtype=np.float32)
    noisy = score_samples(clf, noise)
    assert noisy["confidence"] < real["confidence"]


def test_fid_orders_distributions():
    """FID in classifier feature space: real-vs-real ~0, and both
    collapse and noise score far worse."""
    arrs = to_flat_float(synthetic_mnist(2000, 800, seed=0))
    clf = train_classifier(arrs["x_train"], arrs["y_train"], steps=300)
    half_a, half_b = arrs["x_test"][:400], arrs["x_test"][400:]
    f_self = fid_score(clf, half_a, half_b)
    collapsed = np.tile(arrs["x_test"][:1], (400, 1))
    f_col = fid_score(clf, half_a, collapsed)
    rng = np.random.default_rng(0)
    noise = rng.random((400, 784), dtype=np.float32)
    f_noise = fid_score(clf, half_a, noise)
    assert f_self >= 0.0
    assert f_col > 5 * f_self
    assert f_noise > 5 * f_self
    # exact self-comparison is (near) zero
    assert fid_score(clf, half_a, half_a) < 1e-6
