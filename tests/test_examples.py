"""The example scripts double as integration tests (reference: nbval over
docs/examples)."""

import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_simple():
    import simple
    assert simple.main(n=1 << 8, iterations=10)


def test_multitask():
    import multitask
    assert multitask.main(n_hi=1 << 5, iterations=10)


def test_batch_multitask():
    import batch_multitask
    assert batch_multitask.main(B=2, n=1 << 6, iterations=6)


def test_derivative_informed():
    import derivative_informed
    assert derivative_informed.main(n=1 << 6, iterations=10)


def test_hyperposterior():
    import hyperposterior
    assert hyperposterior.main(n=1 << 6, num_samples=50, num_chains=2)
