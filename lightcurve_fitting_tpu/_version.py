"""Git-derived package version (reference parity: the reference ships
versioneer, reference setup.cfg + versioneer.py; this is the same idea in
~50 lines without the vendored machinery).

``get_version()`` returns:

- ``BASE+g<sha>[.dirty]`` when running from a git checkout (the sha is the
  current HEAD, ``.dirty`` marks uncommitted changes) — so a bug report's
  printed version pins the exact tree it came from;
- ``BASE+g<sha>`` parsed from a git tag ``v<BASE>`` when HEAD is tagged
  (``git describe`` exact match -> plain ``<BASE>``, a release);
- the static ``BASE`` when git is unavailable (installed wheel/sdist).

The lookup runs once at import (subprocess cost ~ms, cached in
``__version__``) and NEVER raises: any git failure falls back to BASE.
"""

import os
import subprocess

BASE = "0.1.0"  # must match pyproject.toml [project] version


def _git(*args):
    out = subprocess.run(
        ["git", *args], cwd=os.path.dirname(os.path.abspath(__file__)),
        capture_output=True, text=True, timeout=10)
    if out.returncode != 0:
        raise RuntimeError(out.stderr.strip())
    return out.stdout.strip()


def get_version():
    try:
        described = _git("describe", "--tags", "--match", "v*", "--dirty",
                         "--always")
    except Exception:
        return BASE
    if not described:
        return BASE
    dirty = described.endswith("-dirty")
    if dirty:
        described = described[: -len("-dirty")]
    # PEP 440: extra commits and the sha go in the LOCAL segment
    # ("0.1.0+3.g<sha>"), which sorts AFTER the 0.1.0 release — a
    # ".devN" public segment would sort BEFORE it, inverting upgrades
    local = []
    if described.startswith("v"):
        # tagged: "v0.1.0" (release) or "v0.1.0-3-g<sha>" (3 commits past)
        parts = described[1:].split("-")
        version = parts[0]
        if len(parts) > 1:
            local += [parts[1], parts[2]]
    else:
        # no tag anywhere: describe --always gives the bare abbreviated sha
        version = BASE
        local.append(f"g{described}")
    if dirty:
        local.append("dirty")
    if local:
        version += "+" + ".".join(local)
    return version


__version__ = get_version()
