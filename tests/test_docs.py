"""The committed API reference (docs/api.md) is generated — keep it in sync
with the live signatures (the reference's analog is a Sphinx API page built
in CI, reference .travis.yml docs build)."""

import importlib.util
import os


def test_api_reference_in_sync():
    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "build_api_docs", os.path.join(root, "tools", "build_api_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    generated = mod.build()
    with open(os.path.join(root, "docs", "api.md")) as f:
        committed = f.read()
    assert generated == committed, (
        "docs/api.md is stale: run `python tools/build_api_docs.py`")


def test_api_reference_covers_driver_surface():
    with open(os.path.join(os.path.dirname(__file__), "..", "docs", "api.md")) as f:
        text = f.read()
    for name in ["lightcurve_mcmc", "lightcurve_hmc", "lightcurve_map",
                 "lightcurve_evidence", "lightcurve_ptmcmc",
                 "calculate_bolometric", "calibrate_spectra", "EnsembleSampler",
                 "NUTSSampler", "fit_population", "checkpoint_every"]:
        assert name in text, name


def test_golden_manifest_verify():
    """Golden-drift guard (docs/goldens.md): recompute every derived data
    artifact from the reference checkout and diff against the committed
    files. Skips when the reference checkout is unavailable."""
    import pytest
    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "build_data", os.path.join(root, "tools", "build_data.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not os.path.isdir(mod.REF):
        pytest.skip("reference checkout not available")
    assert mod.verify() == 0, "committed goldens drifted from the reference recomputation"
