#!/usr/bin/env python
"""Convert filter transmission curves from SVO-style JSON to the two-column
text format the filter registry reads (behavioral spec: reference
lightcurve_fitting/filters/json2txt.py:1-9).

Each input JSON file holds ``[[name], [wl, trans], [wl, trans], ...]``; the
output is ``<name>.txt`` with one ``wavelength transmission`` pair per line
(wavelength to 0.1 Angstrom, transmission to 1e-9 — the precision the
packed curves in data/filter_curves.npz were built from).

Usage: python tools/json2txt.py curve1.json [curve2.json ...] [-o OUTDIR]

This exists for registry-extension workflows (drop a new instrument's SVO
JSON next to this script, convert, then repack with tools/build_data.py);
the shipped curves are already packed and golden-guarded (docs/goldens.md).
"""

import argparse
import json
import os

import numpy as np


def json_curve_to_txt(json_path, outdir="."):
    """Convert one JSON curve file; returns the written path."""
    with open(json_path) as f:
        data = json.load(f)
    if not data or not isinstance(data[0], (list, tuple)) or not data[0]:
        raise ValueError(f"{json_path}: expected [[name], [wl, trans], ...]")
    name = str(data[0][0])
    pairs = np.asarray(data[1:], float)
    if pairs.ndim != 2 or pairs.shape[1] != 2:
        raise ValueError(f"{json_path}: curve rows must be [wl, trans] pairs")
    out = os.path.join(outdir, name + ".txt")
    np.savetxt(out, pairs, "%.1f %.9f")
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("json_files", nargs="+")
    parser.add_argument("-o", "--outdir", default=".")
    args = parser.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
    for path in args.json_files:
        print(json_curve_to_txt(path, args.outdir))


if __name__ == "__main__":
    main()
