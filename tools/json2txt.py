"""Convert JSON filter-curve exports to two-column transmission text files.

Reference parity (reference lightcurve_fitting/filters/json2txt.py:1-9): the
reference ships a cwd-glob loop that reads JSON files of the form

    [["<filter name>", ...meta...], [wl_angstrom, transmission], ...]

and writes ``<filter name>.txt`` with one ``%.1f %.9f`` row per sample —
the format its (and our) filter registry ingests. This is the same
converter as a proper CLI: explicit file arguments (globs still work via
the shell), an ``--outdir``, and validation errors instead of silent
garbage. New filter curves produced by observatory pipelines in that JSON
shape drop straight into ``lightcurve_fitting_tpu/data/filters/`` (then
re-pack with ``tools/build_data.py``).

Usage: python tools/json2txt.py curve1.json [curve2.json ...] [--outdir DIR]
"""

import argparse
import json
import os
import sys

import numpy as np


def convert(path, outdir="."):
    """Convert one JSON curve file; returns the written txt path."""
    with open(path) as fh:
        data = json.load(fh)
    if (not isinstance(data, list) or len(data) < 2
            or not isinstance(data[0], list) or not data[0]
            or not isinstance(data[0][0], str)):
        raise ValueError(f"{path}: expected [[name, ...], [wl, trans], ...]")
    name = data[0][0]
    samples = np.asarray(data[1:], float)
    if samples.ndim != 2 or samples.shape[1] != 2:
        raise ValueError(f"{path}: curve rows must be [wavelength, "
                         f"transmission] pairs (got shape {samples.shape})")
    if np.any(~np.isfinite(samples)):
        raise ValueError(f"{path}: non-finite curve samples")
    out = os.path.join(outdir, name + ".txt")
    np.savetxt(out, samples, "%.1f %.9f")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("files", nargs="+", help="JSON curve files to convert")
    ap.add_argument("--outdir", default=".", help="output directory")
    cli = ap.parse_args(argv)
    os.makedirs(cli.outdir, exist_ok=True)
    for path in cli.files:
        print(convert(path, cli.outdir))
    return 0


if __name__ == "__main__":
    sys.exit(main())
