"""Doctests as spec, the reference's convention (/root/reference/
pytest.ini:8-9 runs --doctest-modules so every docstring example is a
test). The driver invokes plain `pytest tests/`, so instead of addopts
this module walks every gordo_spark module and runs its doctests —
docstring examples (e.g. the hourglass dim arithmetic reproduced from the
reference's factories) can never drift from the code.

Spark-dependent examples are not used in docstrings by convention; any
module whose import requires optional externals is skipped explicitly.
"""

import doctest
import importlib
import pkgutil

import pytest

import gordo_spark


def _iter_modules():
    prefix = gordo_spark.__name__ + "."
    yield gordo_spark.__name__
    for m in pkgutil.walk_packages(gordo_spark.__path__, prefix):
        yield m.name


MODULES = sorted(_iter_modules())


@pytest.mark.parametrize("modname", MODULES)
def test_module_doctests(modname):
    mod = importlib.import_module(modname)
    results = doctest.testmod(
        mod, verbose=False, optionflags=doctest.NORMALIZE_WHITESPACE
    )
    assert results.failed == 0, f"{modname}: {results.failed} doctest failures"


def test_doctest_corpus_is_nonempty():
    """At least some modules must actually carry runnable examples —
    guards against the harness silently testing nothing."""
    total = 0
    for modname in MODULES:
        mod = importlib.import_module(modname)
        finder = doctest.DocTestFinder()
        total += sum(len(t.examples) for t in finder.find(mod))
    assert total >= 10, f"only {total} doctest examples found"
