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


def _load_tool(name):
    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(root, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_docs_site_builds_strict(tmp_path):
    """The docs pipeline builds (VERDICT r4 #6; the reference's CI is a
    Sphinx docs build, reference .travis.yml:26-30) — strict mode: any
    broken cross-reference or unrenderable page fails."""
    mod = _load_tool("build_docs")
    assert mod.build(str(tmp_path), strict=True) == 0
    for page in ["index", "usage", "api", "design", "validation"]:
        html = (tmp_path / f"{page}.html").read_text()
        assert "<nav>" in html and "lightcurve_fitting_tpu" in html


def test_docs_site_strict_catches_broken_link(tmp_path):
    mod = _load_tool("build_docs")
    bad = tmp_path / "bad.md"
    bad.write_text("see [missing](no/such/file.py)")
    rc = mod.build(str(tmp_path / "out"), strict=True,
                   pages=[("bad", str(bad), "Bad")])
    assert rc == 1


def test_version_is_git_derived():
    """versioneer-parity (reference setup.cfg): in a checkout the version
    pins the exact commit; the static base is the fallback elsewhere."""
    import re
    import subprocess
    import lightcurve_fitting_tpu as pkg
    from lightcurve_fitting_tpu import _version

    assert pkg.__version__.startswith(_version.BASE.split("+")[0][:3])
    # Re-derive at test time rather than comparing the import-time
    # pkg.__version__ against the current HEAD: a commit landing while the
    # suite runs would otherwise fail this test spuriously (seen round 5).
    version_now = _version.get_version()
    full_sha = subprocess.run(["git", "rev-parse", "HEAD"],
                              cwd=os.path.dirname(pkg.__file__),
                              capture_output=True, text=True).stdout.strip()
    if full_sha:  # running from the git checkout
        m = re.search(r"\+g([0-9a-f]+)", version_now)
        assert m, version_now  # untagged checkout: +g<sha> must appear
        assert full_sha.startswith(m.group(1)), (version_now, full_sha)


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
