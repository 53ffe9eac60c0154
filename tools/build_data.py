#!/usr/bin/env python
"""Build the framework's packed data files from the reference checkout's public
data tables (filter transmission curves from the SVO Filter Profile Service /
instrument teams, the SiFTO SN Ia spectral template of Conley et al. 2008, and
the SN 2016bkv example photometry).

This script is run once at development time with the reference available at
/root/reference; its outputs under lightcurve_fitting_tpu/data/ are committed.
The curves are *resampled* onto uniform wavelength grids and packed into a single
npz — the framework's device FilterBank wants fixed-length per-band quadrature
nodes, not ragged native grids (see SURVEY.md §7).

Outputs
-------
data/filter_curves.npz : for each filter with a transmission table:
    <name>__wl : uniform wavelength grid (nm, ascending)
    <name>__T  : normalized transmission on that grid
data/sifto.npz         : SiFTO template (Epoch + UBVgri columns)
data/SN2016bkv.csv     : example photometry, CSV
data/golden_filters.json : per-filter wl_eff/dwl/freq_eff/dfreq/ranges computed on
    the *native* grids with the reference's formulas (filters.py:170-230), plus
    band-averaged blackbody L_nu golden values on the native grids — used by tests
    to validate the resampled pipeline end to end.
"""

import json
import os
import sys

import numpy as np

REF = "/root/reference/lightcurve_fitting"
OUT = os.path.join(os.path.dirname(__file__), "..", "lightcurve_fitting_tpu", "data")

C_AA_THZ = 2.99792458e6      # c in angstrom*THz
C_NM_THZ = C_AA_THZ / 10.0   # c in nm*THz
H_PLANCK = 6.62607015e-34
K_B_SI = 1.380649e-23
C_LIGHT = 2.99792458e8
R_SUN = 6.957e8
c1 = H_PLANCK / K_B_SI * 1e12 / 1e3
c2 = 8.0 * np.pi ** 2 * H_PLANCK / C_LIGHT ** 2 * (1e3 * R_SUN) ** 2 * (1e12) ** 3

# (name, filename, angstrom?) — transmission-curve table from the reference registry
# (reference filters.py:369-440)
CURVES = [
    ("FUV", "GALEX_GALEX.FUV.dat", True),
    ("NUV", "GALEX_GALEX.NUV.dat", True),
    ("UVW2", "Swift_UVOT.UVW2.dat", True),
    ("UVM2", "Swift_UVOT.UVM2.dat", True),
    ("UVW1", "Swift_UVOT.UVW1.dat", True),
    ("u", "SLOAN_SDSS.u.dat", True),
    ("U_S", "Swift_UVOT.U.dat", True),
    ("U", "Generic_Johnson.U.dat", True),
    ("B", "Generic_Johnson.B.dat", True),
    ("B_S", "Swift_UVOT.B.dat", True),
    ("g", "SLOAN_SDSS.g.dat", True),
    ("g-DECam", "CTIO_DECam.g.dat", True),
    ("c", "ATLAS_cyan.txt", False),
    ("V", "Generic_Johnson.V.dat", True),
    ("V_S", "Swift_UVOT.V.dat", True),
    ("Itagaki", "KAF-1001E.asci", False),
    ("white", "white.txt", False),
    ("unfilt.", "pseudobolometric.txt", False),
    ("G", "GAIA_GAIA0.G.dat", True),
    ("Kepler", "Kepler_Kepler.K.dat", True),
    ("TESS", "TESS_TESS.Red.dat", True),
    ("DLT40", "QE_E2V_MBBBUV_Broadband.csv", False),
    ("w", "PAN-STARRS_PS1.w.dat", True),
    ("o", "ATLAS_orange.txt", False),
    ("r", "SLOAN_SDSS.r.dat", True),
    ("r-DECam", "CTIO_DECam.r.dat", True),
    ("R", "Generic_Cousins.R.dat", True),
    ("i", "SLOAN_SDSS.i.dat", True),
    ("i-DECam", "CTIO_DECam.i.dat", True),
    ("I", "Generic_Cousins.I.dat", True),
    ("z_s", "PAN-STARRS_PS1.z.dat", True),
    ("z", "SLOAN_SDSS.z.dat", True),
    ("z-DECam", "CTIO_DECam.z.dat", True),
    ("y", "PAN-STARRS_PS1.y.dat", True),
    ("y-DECam", "CTIO_DECam.Y.dat", True),
    ("J", "Gemini_Flamingos2.J.dat", True),
    ("H", "Gemini_Flamingos2.H.dat", True),
    ("K", "Gemini_Flamingos2.Ks.dat", True),
    ("F070W", "JWST_NIRCam.F070W.dat", True),
    ("F090W", "JWST_NIRCam.F090W.dat", True),
    ("F115W", "JWST_NIRCam.F115W.dat", True),
    ("F150W", "JWST_NIRCam.F150W.dat", True),
    ("F182M", "JWST_NIRCam.F182M.dat", True),
    ("F200W", "JWST_NIRCam.F200W.dat", True),
    ("F250M", "JWST_NIRCam.F250M.dat", True),
    ("F277W", "JWST_NIRCam.F277W.dat", True),
    ("F300M", "JWST_NIRCam.F300M.dat", True),
    ("F335M", "JWST_NIRCam.F335M.dat", True),
    ("F356W", "JWST_NIRCam.F356W.dat", True),
    ("F360M", "JWST_NIRCam.F360M.dat", True),
    ("F444W", "JWST_NIRCam.F444W.dat", True),
    ("F560W", "JWST_MIRI.F560W.dat", True),
    ("F770W", "JWST_MIRI.F770W.dat", True),
    ("F1000W", "JWST_MIRI.F1000W.dat", True),
    ("F1130W", "JWST_MIRI.F1130W.dat", True),
    ("F1280W", "JWST_MIRI.F1280W.dat", True),
    ("F1500W", "JWST_MIRI.F1500W.dat", True),
    ("F1800W", "JWST_MIRI.F1800W.dat", True),
    ("F2100W", "JWST_MIRI.F2100W.dat", True),
    ("F2550W", "JWST_MIRI.F2550W.dat", True),
]


def read_native(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            if len(parts) >= 2:
                try:
                    rows.append((float(parts[0]), float(parts[1])))
                except ValueError:
                    continue  # header line
    arr = np.array(rows)
    return arr[:, 0], arr[:, 1]


def native_metadata(wl_nm, T):
    """Reference formulas from filters.py:170-230, on the native grid."""
    order = np.argsort(wl_nm, kind="stable")
    wl = wl_nm[order]
    T = T[order] / T[order].max()
    # some curves encode step edges as duplicate wavelengths (e.g.
    # pseudobolometric.txt); nudge duplicates so interpolation keeps the step
    for i in range(1, len(wl)):
        if wl[i] <= wl[i - 1]:
            wl[i] = np.nextafter(wl[i - 1], np.inf)
    freq = C_NM_THZ / wl

    dwl = np.trapezoid(T, wl)
    wl_eff = np.trapezoid(T * wl, wl) / dwl
    above = wl[T > 0.5]
    wl0_guess, wl1_guess = above.min(), above.max()
    left_sel = (wl <= wl0_guess) & (T >= 0.1)
    wl0 = np.interp(0.5, T[left_sel], wl[left_sel])
    right_sel = (wl >= wl1_guess) & (T >= 0.1)
    wl1 = np.interp(0.5, T[right_sel][::-1], wl[right_sel][::-1])

    dfreq = np.trapezoid(T, freq)          # negative (freq decreasing)
    freq_eff = np.trapezoid(T * freq, freq) / dfreq
    freq0 = np.interp(0.5, T[right_sel][::-1], freq[right_sel][::-1])
    freq1 = np.interp(0.5, T[left_sel], freq[left_sel])

    return dict(
        wl_eff=wl_eff, dwl=dwl,
        wl_range=(wl_eff - wl0, wl1 - wl_eff),
        freq_eff=freq_eff, dfreq=-dfreq,
        freq_range=(freq_eff - freq0, freq1 - freq_eff),
    ), (wl, T, freq)


def native_synth_planck(wl, T, freq, temp_kk, rad_krsun, z):
    """Band-averaged blackbody L_nu on the native grid (reference
    filters.py:288-310 + models.py:1105-1128), ebv=0."""
    T_per_freq = T / freq
    T_norm = T_per_freq / np.trapezoid(T_per_freq, freq)
    nu_emit = freq * (1.0 + z)
    lnu = c2 * rad_krsun ** 2 * nu_emit ** 3 / np.expm1(c1 * nu_emit / temp_kk)
    return np.trapezoid(lnu * T_norm, freq)


def build_artifacts(quiet=False):
    """Recompute every derived data artifact from the reference checkout.

    Returns ``(curves, golden, sifto_names, sifto_table, csv_text)`` — the
    exact contents of the four committed files under
    ``lightcurve_fitting_tpu/data/``. Used both to (re)generate them and, via
    ``--verify``, to detect silent drift between the committed goldens and
    what the pinned reference behaviors produce (see docs/goldens.md)."""
    curves = {}
    golden = {}
    for name, fname, angstrom in CURVES:
        path = os.path.join(REF, "filters", fname)
        wl, T = read_native(path)
        if angstrom:
            wl = wl / 10.0
        meta, (wl_s, T_s, freq_s) = native_metadata(wl, T)
        golden[name] = {k: (list(map(float, v)) if isinstance(v, tuple) else float(v))
                        for k, v in meta.items()}
        # golden band-averaged blackbody values on the native grid
        synth = {}
        for temp, rad, z in [(10.0, 10.0, 0.0), (3.0, 30.0, 0.0), (30.0, 1.0, 0.0),
                             (10.0, 10.0, 0.05), (1.5, 5.0, 0.002)]:
            synth[f"T{temp}_R{rad}_z{z}"] = float(native_synth_planck(wl_s, T_s, freq_s, temp, rad, z))
        golden[name]["synth_planck"] = synth
        # store the native grid (sorted, duplicates nudged): host integration and
        # the FilterBank's default padded-native quadrature then reproduce the
        # reference's trapezoids exactly
        curves[name + "__wl"] = wl_s.astype(np.float64)
        curves[name + "__T"] = T_s.astype(np.float64)
        if not quiet:
            print(f"{name:12s} n_native={len(wl_s):5d} "
                  f"wl_eff={meta['wl_eff']:.2f}nm freq_eff={meta['freq_eff']:.2f}THz")

    # SiFTO template (models/sifto.dat: Epoch + UBVgri)
    sifto_path = os.path.join(REF, "models", "sifto.dat")
    data = np.loadtxt(sifto_path, comments="#")
    with open(sifto_path) as f:
        headerline = f.readline().strip("# \n")
    names = headerline.split()

    # example photometry -> CSV (fixed-width two-line source: column spans come
    # from the dashes row; values like "Las Cumbres" contain spaces)
    ex_path = os.path.join(REF, "example", "SN2016bkv.txt")
    with open(ex_path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    dashes = lines[1]
    spans = []
    start = None
    for i, ch in enumerate(dashes + " "):
        if ch == "-" and start is None:
            start = i
        elif ch != "-" and start is not None:
            spans.append((start, i))
            start = None
    header = [lines[0][a:b].strip() for a, b in spans]
    rows = [[ln[a:b].strip() for a, b in spans] for ln in lines[2:]]
    csv_text = ",".join(header) + "\n" + "".join(",".join(r) + "\n" for r in rows)
    return curves, golden, names, data, csv_text


def main():
    os.makedirs(OUT, exist_ok=True)
    curves, golden, sifto_names, sifto_table, csv_text = build_artifacts()
    np.savez_compressed(os.path.join(OUT, "filter_curves.npz"), **curves)
    with open(os.path.join(OUT, "golden_filters.json"), "w") as f:
        json.dump(golden, f, indent=1)
    np.savez_compressed(os.path.join(OUT, "sifto.npz"),
                        names=np.array(sifto_names), table=sifto_table)
    print(f"sifto: {sifto_table.shape} cols={sifto_names}")
    with open(os.path.join(OUT, "SN2016bkv.csv"), "w") as f:
        f.write(csv_text)
    print(f"example: {csv_text.count(chr(10)) - 1} rows")


def verify():
    """Check the committed artifacts against a fresh recomputation from the
    reference checkout (golden-drift guard; see docs/goldens.md). Returns a
    nonzero exit code and prints every mismatch if anything drifted."""
    curves, golden, sifto_names, sifto_table, csv_text = build_artifacts(quiet=True)
    problems = []

    with np.load(os.path.join(OUT, "filter_curves.npz")) as fz:
        keys = set(fz.files)
        if keys != set(curves):
            problems.append(f"filter_curves.npz keys differ: "
                            f"missing={sorted(set(curves) - keys)} "
                            f"extra={sorted(keys - set(curves))}")
        for k in sorted(keys & set(curves)):
            if not np.array_equal(fz[k], curves[k]):
                problems.append(f"filter_curves.npz[{k}] drifted")

    with open(os.path.join(OUT, "golden_filters.json")) as f:
        committed = json.load(f)
    # round-trip the recomputation through json so float repr matches exactly
    recomputed = json.loads(json.dumps(golden))
    if committed != recomputed:
        for name in sorted(set(committed) | set(recomputed)):
            if committed.get(name) != recomputed.get(name):
                problems.append(f"golden_filters.json[{name!r}] drifted: "
                                f"{committed.get(name)} != {recomputed.get(name)}")

    with np.load(os.path.join(OUT, "sifto.npz")) as fz:
        if list(fz["names"]) != list(np.array(sifto_names)) \
                or not np.array_equal(fz["table"], sifto_table):
            problems.append("sifto.npz drifted")

    with open(os.path.join(OUT, "SN2016bkv.csv")) as f:
        if f.read() != csv_text:
            problems.append("SN2016bkv.csv drifted")

    n_files = 4
    n_curves = sum(1 for k in curves if k.endswith("__wl"))
    n_golden = sum(1 + len(v["synth_planck"]) for v in golden.values())
    if problems:
        for p in problems:
            print("DRIFT:", p)
        print(f"verify FAILED: {len(problems)} mismatches across {n_files} artifacts")
        return 1
    print(f"verify OK: {n_files} artifacts match the reference recomputation "
          f"({n_curves} filter curves, {n_golden} golden scalar groups, "
          f"SiFTO {sifto_table.shape}, example CSV)")
    return 0


if __name__ == "__main__":
    if "--verify" in sys.argv[1:]:
        sys.exit(verify())
    sys.exit(main())
