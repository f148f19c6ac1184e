"""Executable docstring examples as golden tests.

The reference ships ~100-line runnable doctest examples on each model class
(`pytest --doctest-modules fastgps/`, reference makefile:5); this runs ours
under the suite's pinned CPU/x64 environment (conftest) so the printed
values are stable goldens.
"""

import doctest

import pytest

from fastgaussianprocesses_tpu.models import digital_gp, lattice_gp, standard_gp


@pytest.mark.parametrize("module", [lattice_gp, digital_gp, standard_gp])
def test_model_docstring_examples(module):
    results = doctest.testmod(module, verbose=False, raise_on_error=False)
    assert results.attempted > 0, f"no doctests found in {module.__name__}"
    assert results.failed == 0, f"{results.failed} doctest failures in {module.__name__}"
