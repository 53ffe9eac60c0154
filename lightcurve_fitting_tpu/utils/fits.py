"""Minimal FITS reader for 1-D spectra.

Replaces the subset of ``astropy.io.fits`` + ``astropy.wcs`` used by the
reference's spectral-calibration module (speccal.py:46-102): primary/image HDUs
with a linear (or log-linear) wavelength WCS, and simple binary tables with
'wavelength'/'flux' columns. Big-endian, block-structured per the FITS 4.0
standard. Not a general FITS implementation.
"""

import numpy as np

__all__ = ["Header", "HDU", "open", "linear_wavelength"]

BLOCK = 2880
_builtin_open = open


class Header(dict):
    """A FITS header as a dict with lenient access helpers."""

    def __init__(self):
        super().__init__()
        self.comments = {}

    def get(self, key, default=None):
        return super().get(str(key).upper(), default)

    def __getitem__(self, key):
        return super().__getitem__(str(key).upper())

    def __contains__(self, key):
        return super().__contains__(str(key).upper())


def _parse_value(raw):
    raw = raw.strip()
    if not raw:
        return None
    if raw.startswith("'"):
        end = raw.rfind("'")
        return raw[1:end].replace("''", "'").rstrip()
    if raw == "T":
        return True
    if raw == "F":
        return False
    try:
        if any(c in raw for c in ".eEdD") and not raw.lstrip("+-").isdigit():
            return float(raw.replace("D", "E").replace("d", "e"))
        return int(raw)
    except ValueError:
        return raw


def _read_header(fh):
    hdr = Header()
    while True:
        block = fh.read(BLOCK)
        if len(block) < BLOCK:
            if not hdr:
                return None
            raise EOFError("truncated FITS header")
        text = block.decode("latin-1")
        done = False
        for i in range(0, BLOCK, 80):
            card = text[i:i + 80]
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if not key or key in ("COMMENT", "HISTORY"):
                continue
            if card[8:10] != "= ":
                continue
            rest = card[10:]
            if rest.lstrip().startswith("'"):
                # string value: the closing quote is the first UNPAIRED
                # quote — FITS 4.0 escapes a literal quote as '' (an
                # apostrophe in a numeric card's comment is NOT a string
                # marker, hence the startswith gate)
                j = rest.find("'") + 1
                while True:
                    k = rest.find("'", j)
                    if k == -1:           # unterminated: take the whole card
                        j = len(rest)
                        break
                    if rest[k + 1:k + 2] == "'":
                        j = k + 2         # escaped '' -> keep scanning
                        continue
                    j = k + 1
                    break
                valstr = rest[:j]
                comment = rest[j:].partition("/")[2]
            else:
                valstr, _, comment = rest.partition("/")
            val = _parse_value(valstr)
            hdr[key] = val
            hdr.comments[key] = comment.strip()
        if done:
            return hdr


_BITPIX_DTYPE = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8", -32: ">f4", -64: ">f8"}
_TFORM_DTYPE = {"L": ">u1", "B": ">u1", "I": ">i2", "J": ">i4", "K": ">i8",
                "E": ">f4", "D": ">f8", "A": "S"}


class HDU:
    def __init__(self, header, data):
        self.header = header
        self.data = data

    @property
    def is_table(self):
        return self.header.get("XTENSION", "").strip().upper() == "BINTABLE"


def _read_data(fh, hdr):
    naxis = hdr.get("NAXIS", 0)
    if naxis == 0:
        return None
    shape = [hdr[f"NAXIS{i}"] for i in range(naxis, 0, -1)]
    xtension = (hdr.get("XTENSION") or "").strip().upper()
    pcount = hdr.get("PCOUNT", 0)
    if xtension == "BINTABLE":
        nrow = hdr["NAXIS2"]
        rowbytes = hdr["NAXIS1"]
        nbytes = nrow * rowbytes + pcount
        raw = fh.read(_padded(nbytes))[: nrow * rowbytes]
        return _parse_bintable(hdr, raw, nrow, rowbytes)
    bitpix = hdr["BITPIX"]
    dtype = np.dtype(_BITPIX_DTYPE[bitpix])
    count = int(np.prod(shape)) if shape else 0
    nbytes = count * dtype.itemsize + pcount
    raw = fh.read(_padded(nbytes))[: count * dtype.itemsize]
    arr = np.frombuffer(raw, dtype=dtype).reshape(shape).astype(
        np.float64 if bitpix < 0 or ("BSCALE" in hdr or "BZERO" in hdr) else dtype.newbyteorder("="))
    if "BSCALE" in hdr or "BZERO" in hdr:
        arr = arr * hdr.get("BSCALE", 1.0) + hdr.get("BZERO", 0.0)
    return arr


def _padded(n):
    return ((n + BLOCK - 1) // BLOCK) * BLOCK


def _parse_bintable(hdr, raw, nrow, rowbytes):
    tfields = hdr["TFIELDS"]
    names = []
    dtypes = []
    for i in range(1, tfields + 1):
        name = str(hdr.get(f"TTYPE{i}", f"col{i}")).strip()
        tform = str(hdr[f"TFORM{i}"]).strip()
        repeat = ""
        j = 0
        while j < len(tform) and tform[j].isdigit():
            repeat += tform[j]
            j += 1
        r = int(repeat) if repeat else 1
        code = tform[j]
        if code == "A":
            dtypes.append((name, f"S{r}"))
        else:
            base = _TFORM_DTYPE[code]
            dtypes.append((name, base, (r,)) if r > 1 else (name, base))
        names.append(name)
    rec = np.frombuffer(raw, dtype=np.dtype(dtypes))
    out = {}
    for name in names:
        col = rec[name]
        out[name.lower()] = col.squeeze() if col.ndim > 1 else col
    return _TableData(out)


class _TableData:
    """Column access by case-insensitive name, like a FITS_rec."""

    def __init__(self, cols):
        self._cols = cols

    def __getitem__(self, key):
        return np.asarray(self._cols[str(key).lower()])

    @property
    def names(self):
        return list(self._cols)


def open(filename):
    """Read all HDUs of a FITS file."""
    hdus = []
    with _builtin_open(filename, "rb") as fh:
        while True:
            hdr = _read_header(fh)
            if hdr is None:
                break
            data = _read_data(fh, hdr)
            hdus.append(HDU(hdr, data))
    return hdus


def linear_wavelength(hdr, n):
    """Wavelength solution from a linear (or log-linear) 1-D WCS: CRVAL1 +
    (pix+1-CRPIX1)*CDELT1, with CD1_1 as an alternative increment keyword."""
    crval = hdr.get("CRVAL1", 0.0)
    crpix = hdr.get("CRPIX1", 1.0)
    cdelt = hdr.get("CDELT1", hdr.get("CD1_1", 1.0))
    pix = np.arange(n, dtype=float)
    wl = crval + (pix + 1.0 - crpix) * cdelt
    ctype = str(hdr.get("CTYPE1", "")).upper()
    if hdr.get("DC-FLAG") == 1 or ctype.endswith("-LOG"):
        wl = 10.0 ** wl
    return wl
