"""ASCII table I/O: a minimal replacement for the ``astropy.io.ascii`` formats the
reference package relies on (generic ``ascii`` auto-detection at
``lightcurve.py:677`` and ``ascii.fixed_width_two_line`` at ``bolometric.py:830``)."""

import os
import re

import numpy as np

__all__ = ["read_table", "write_table"]

_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eEdD][+-]?\d+)?$|^[+-]?(inf|nan)$", re.IGNORECASE)


def _split_line(line, delimiter):
    if delimiter is None:
        return line.split()
    return [p.strip() for p in line.split(delimiter)]


def read_table(cls, filepath, format="ascii", fill_values=None, names=None, delimiter=None, **kwargs):
    """Read a whitespace/CSV/fixed-width-two-line ascii table into ``cls``."""
    if hasattr(filepath, "read"):
        text = filepath.read()
    else:
        with open(filepath) as f:
            text = f.read()

    comments = []
    lines = []
    for raw in text.splitlines():
        stripped = raw.strip()
        if not stripped:
            continue
        if stripped.startswith("#"):
            comments.append(stripped.lstrip("#").strip())
            continue
        lines.append(raw)

    if not lines:
        raise ValueError(f"no data in {filepath}")

    if format in ("csv", "ascii.csv") or (delimiter is None and "," in lines[0] and len(lines[0].split(",")) > 1):
        delimiter = ","

    header = None
    data_start = 0
    first = _split_line(lines[0], delimiter)
    # fixed_width_two_line: second line is all dashes; the dash runs define the
    # column spans (values may contain spaces, e.g. 'Las Cumbres')
    if len(lines) > 1 and re.fullmatch(r"[-\s]+", lines[1]) and "-" in lines[1]:
        spans = []
        start = None
        for i, ch in enumerate(lines[1] + " "):
            if ch == "-" and start is None:
                start = i
            elif ch != "-" and start is not None:
                spans.append((start, i))
                start = None
        def cut(line):
            n = len(line)
            return [line[min(a, n):b].strip() for a, b in spans]
        header = [h for h in cut(lines[0])]
        rows = [cut(ln) for ln in lines[2:]]
        return _build_table(cls, header, rows, fill_values, comments)
    elif names is not None:
        header = list(names)
        # if the first line looks like a header matching names, skip it
        if all(not _FLOAT_RE.match(tok) for tok in first):
            data_start = 1
    elif any(not _INT_RE.match(tok) and not _FLOAT_RE.match(tok) for tok in first):
        header = first
        data_start = 1
    else:
        header = [f"col{i + 1}" for i in range(len(first))]
        data_start = 0

    rows = [_split_line(ln, delimiter) for ln in lines[data_start:]]
    ncol = len(header)
    for r in rows:
        if len(r) != ncol:
            raise ValueError(f"row has {len(r)} fields, expected {ncol}: {r}")
    return _build_table(cls, header, rows, fill_values, comments)


def _build_table(cls, header, rows, fill_values, comments):
    if fill_values is None:
        fill_list = []
    elif fill_values and isinstance(fill_values[0], str):
        fill_list = [tuple(fill_values)]
    else:
        fill_list = [tuple(fv) for fv in fill_values]
    fill_map = {fv[0]: fv[1] for fv in fill_list}

    columns = []
    for j, name in enumerate(header):
        raw_vals = [r[j] for r in rows]
        mask = np.array([v in fill_map for v in raw_vals], bool)
        vals = [fill_map.get(v, v) for v in raw_vals]
        col = _infer_column(vals, mask)
        columns.append(col)

    t = cls(columns, names=header)
    if comments:
        t.meta["comments"] = comments
    return t


def _infer_column(vals, mask):
    unmasked = [v for v, m in zip(vals, mask) if not m]
    if unmasked and all(v in ("True", "False") for v in unmasked):
        arr = np.array([v == "True" for v in vals], bool)
        return np.ma.MaskedArray(arr, mask=mask)
    if unmasked and all(_INT_RE.match(v) for v in unmasked):
        arr = np.array([int(v) if not m else 0 for v, m in zip(vals, mask)], np.int64)
        return np.ma.MaskedArray(arr, mask=mask)
    if unmasked and all(_FLOAT_RE.match(v) for v in unmasked):
        arr = np.array([float(v.replace("D", "E").replace("d", "e")) if not m else np.nan
                        for v, m in zip(vals, mask)], np.float64)
        return np.ma.MaskedArray(arr, mask=mask)
    arr = np.array(vals)
    return np.ma.MaskedArray(arr, mask=mask)


def _format_value(v, masked):
    if masked:
        return "--"
    if isinstance(v, (float, np.floating)):
        if np.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (bool, np.bool_)):
        return "True" if v else "False"
    return str(v)


def write_table(table, filepath, format="ascii", overwrite=False, delimiter=None, **kwargs):
    if isinstance(filepath, (str, os.PathLike)) and os.path.exists(filepath) and not overwrite:
        raise OSError(f"{filepath} exists; use overwrite=True")

    names = table.colnames
    cells = []
    for i in range(len(table)):
        row = []
        for n in names:
            c = table[n]
            masked = bool(np.ma.getmaskarray(c)[i])
            row.append(_format_value(c[i] if not masked else None, masked))
        cells.append(row)

    if format in ("csv", "ascii.csv") or delimiter == ",":
        lines = [",".join(names)] + [",".join(r) for r in cells]
    elif format == "ascii.fixed_width_two_line":
        widths = [max(len(n), *(len(r[j]) for r in cells)) if cells else len(n)
                  for j, n in enumerate(names)]
        lines = [" ".join(n.rjust(w) for n, w in zip(names, widths)),
                 " ".join("-" * w for w in widths)]
        lines += [" ".join(v.rjust(w) for v, w in zip(r, widths)) for r in cells]
    else:  # plain space-separated
        lines = [" ".join(names)] + [" ".join(r) for r in cells]

    text = "\n".join(lines) + "\n"
    if hasattr(filepath, "write"):
        filepath.write(text)
    else:
        with open(filepath, "w") as f:
            f.write(text)
