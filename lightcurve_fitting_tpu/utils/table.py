"""Minimal masked-column table, API-compatible with the subset of
:class:`astropy.table.Table` used by the reference package.

The reference (`/root/reference/lightcurve_fitting/lightcurve.py:62`) subclasses
``astropy.table.Table``; astropy is not a dependency of this framework, so we provide
our own host-side table with the same observable behavior for the operations the
light-curve layer needs: masked columns, boolean/row indexing, ``group_by`` with
``.groups``/``.groups.keys``, ``vstack``, ``add_row`` with masks, ascii I/O
(including the ``fixed_width_two_line`` format used by ``bolometric.py:830``),
and object-dtype columns (for Filter objects).

Columns are :class:`numpy.ma.MaskedArray` subclasses, so all numpy operations
(``np.insert``, ``np.trapz``, comparisons, …) work on them directly.
"""

from collections import OrderedDict

import numpy as np

__all__ = ["Column", "MaskedColumn", "Table", "Row", "vstack"]


class Column(np.ma.MaskedArray):
    """A named, optionally masked column. Subclass of ``numpy.ma.MaskedArray``
    so every numpy operation works; carries ``name`` and ``unit`` metadata."""

    def __new__(cls, data=None, name=None, mask=None, dtype=None, unit=None, fill_value=None):
        if isinstance(data, np.ma.MaskedArray):
            obj = np.ma.MaskedArray(data, dtype=dtype, copy=False).view(cls)
            if mask is not None:
                obj.mask = mask
        else:
            obj = np.ma.MaskedArray(np.asarray(data, dtype=dtype),
                                    mask=(mask if mask is not None else False)).view(cls)
        obj.name = name if name is not None else getattr(data, "name", None)
        obj.unit = unit if unit is not None else getattr(data, "unit", None)
        if fill_value is not None:
            obj.fill_value = fill_value
        return obj

    def __array_finalize__(self, obj):
        super().__array_finalize__(obj)
        self.name = getattr(obj, "name", None)
        self.unit = getattr(obj, "unit", None)

    @property
    def quantity(self):
        # units are label-only in this framework; the raw values are returned
        return self

    def to(self, unit):
        from . import units as u
        return u.Quantity(np.asarray(self), getattr(self, "unit", None)).to(unit)

    def filled(self, fill_value=None):
        return np.ma.MaskedArray.filled(self, fill_value)

    def tolist(self):
        return np.asarray(self).tolist()


MaskedColumn = Column


class Row:
    """A lightweight view of one table row."""

    def __init__(self, table, index):
        self._table = table
        self._index = index

    def __getitem__(self, key):
        val = self._table[key][self._index]
        return val

    def __setitem__(self, key, value):
        self._table[key][self._index] = value

    def __iter__(self):
        for name in self._table.colnames:
            yield self._table[name][self._index]

    def __len__(self):
        return len(self._table.colnames)

    def keys(self):
        return list(self._table.colnames)

    def values(self):
        return list(self)

    @property
    def colnames(self):
        return self._table.colnames

    def __repr__(self):
        vals = ", ".join(f"{k}={self[k]!r}" for k in self.keys())
        return f"<Row {self._index}: {vals}>"


class _Groups:
    """Container for the result of :meth:`Table.group_by`."""

    def __init__(self, parent, indices, keys):
        self._parent = parent
        self.indices = indices  # boundaries into the sorted parent
        self.keys = keys        # Table of unique key combinations

    def __len__(self):
        return len(self.indices) - 1

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def __getitem__(self, i):
        return self._parent[self.indices[i]:self.indices[i + 1]]


def _coerce_column(data, name=None, dtype=None, length=None):
    if isinstance(data, Column) and dtype is None:
        col = data.copy()
        col.name = name if name is not None else col.name
        return col
    is_scalar = (np.isscalar(data) or data is None or isinstance(data, (str, bytes, np.generic))
                 or (not isinstance(data, (list, tuple, np.ndarray)) and np.ndim(data) == 0))
    if is_scalar:
        if length is None:
            length = 1
        if data is None:
            arr = np.ma.MaskedArray(np.zeros(length), mask=True)
        elif np.isscalar(data) or isinstance(data, (str, bytes, np.generic)):
            arr = np.ma.MaskedArray([data] * length)
        else:  # arbitrary object (e.g. a Filter): broadcast into an object column
            arr = np.ma.MaskedArray(np.array([data] * length, dtype=object))
        return Column(arr, name=name, dtype=dtype)
    if isinstance(data, np.ma.MaskedArray):
        return Column(data, name=name, dtype=dtype)
    arr = np.asarray(data, dtype=dtype)
    return Column(np.ma.MaskedArray(arr), name=name)


_NP_DTYPES = {float: np.float64, int: np.int64, bool: np.bool_, str: object}


def _resolve_dtype(dt):
    if dt in _NP_DTYPES:
        return _NP_DTYPES[dt]
    if isinstance(dt, str) and dt.startswith("S"):
        return np.dtype("U" + dt[1:])
    return np.dtype(dt)


class Table:
    """Column-oriented table with masked values and a ``meta`` dict."""

    def __init__(self, data=None, names=None, dtype=None, masked=False, meta=None, rows=None, **kwargs):
        self.columns = OrderedDict()
        self.meta = dict(meta) if meta else {}
        self._masked = masked

        if rows is not None:
            if names is None:
                raise ValueError("rows requires names")
            cols = list(zip(*rows)) if rows else [[] for _ in names]
            data = [list(c) for c in cols]

        if data is None:
            if names is not None:
                dtypes = dtype if dtype is not None else [float] * len(names)
                for n, dt in zip(names, dtypes):
                    npdt = _resolve_dtype(dt)
                    self.columns[n] = Column(np.ma.MaskedArray(np.empty(0, dtype=npdt)), name=n)
        elif isinstance(data, Table):
            for n in data.colnames:
                self.columns[n] = data[n].copy()
            # explicit meta= wins over the source table's (astropy semantics)
            explicit_meta = self.meta
            self.meta = dict(data.meta)
            self.meta.update(explicit_meta)
        elif isinstance(data, Row):
            for n in data.colnames:
                self.columns[n] = _coerce_column([data[n]], name=n)
        elif isinstance(data, dict):
            for n, c in data.items():
                self.columns[n] = _coerce_column(c, name=n)
        elif isinstance(data, (list, tuple)):
            if len(data) and isinstance(data[0], dict):  # list of row dicts
                names = list(data[0].keys())
                for n in names:
                    self.columns[n] = _coerce_column([row[n] for row in data], name=n)
            else:
                if names is None:
                    names = [getattr(c, "name", None) or f"col{i}" for i, c in enumerate(data)]
                dtypes = dtype if dtype is not None else [None] * len(names)
                for n, c, dt in zip(names, data, dtypes):
                    self.columns[n] = _coerce_column(c, name=n, dtype=(_resolve_dtype(dt) if dt is not None else None))
        elif isinstance(data, np.ndarray):
            if data.dtype.names:
                for n in data.dtype.names:
                    self.columns[n] = _coerce_column(data[n], name=n)
            else:
                if names is None:
                    names = [f"col{i}" for i in range(data.shape[1])]
                for i, n in enumerate(names):
                    self.columns[n] = _coerce_column(data[:, i], name=n)
        else:
            raise TypeError(f"cannot init Table from {type(data)}")

        self._validate_lengths()

    # ------------------------------------------------------------------ basics
    def _validate_lengths(self):
        lengths = {len(c) for c in self.columns.values()}
        if len(lengths) > 1:
            raise ValueError(f"column length mismatch: { {n: len(c) for n, c in self.columns.items()} }")

    @property
    def colnames(self):
        return list(self.columns.keys())

    def keys(self):
        return self.colnames

    def values(self):
        return list(self.columns.values())

    def __len__(self):
        if not self.columns:
            return 0
        return len(next(iter(self.columns.values())))

    def __contains__(self, name):
        return name in self.columns

    def __iter__(self):
        for i in range(len(self)):
            yield Row(self, i)

    def __bool__(self):
        return len(self) > 0

    @property
    def dtype(self):
        return np.dtype([(n, c.dtype) for n, c in self.columns.items()])

    @property
    def has_masked_values(self):
        return any(np.ma.is_masked(c) for c in self.columns.values())

    @property
    def mask(self):
        out = Table()
        for n, c in self.columns.items():
            out.columns[n] = Column(np.ma.getmaskarray(c).copy(), name=n)
        return out

    # ------------------------------------------------------------- item access
    def __getitem__(self, item):
        if isinstance(item, str):
            return self.columns[item]
        if isinstance(item, (list, tuple)) and len(item) and all(isinstance(i, str) for i in item):
            sub = self._new_like()
            for n in item:
                sub.columns[n] = self.columns[n].copy()
            return sub
        if isinstance(item, (int, np.integer)):
            if item < 0:
                item += len(self)
            return Row(self, int(item))
        # slice, boolean mask, or index array -> new table
        sub = self._new_like()
        for n, c in self.columns.items():
            piece = c[item]
            sub.columns[n] = Column(piece, name=n, unit=c.unit)
        return sub

    def _new_like(self):
        new = self.__class__.__new__(self.__class__)
        Table.__init__(new)
        new.meta = dict(self.meta)
        self._copy_attrs(new)
        return new

    def _copy_attrs(self, new):
        """Subclass hook: copy extra attributes onto derived tables."""

    def __setitem__(self, item, value):
        if isinstance(item, str):
            col = _coerce_column(value, name=item, length=len(self) if self.columns else None)
            if self.columns and len(col) != len(self):
                if col.ndim >= 1 and len(col) != len(self):
                    # allow broadcasting scalars packed as 0-d
                    raise ValueError(f"length mismatch for column {item}: {len(col)} vs {len(self)}")
            self.columns[item] = col
        elif isinstance(item, (int, np.integer)):
            for n, v in zip(self.colnames, value):
                self.columns[n][item] = v
        else:
            raise TypeError(f"cannot set {item!r}")

    # --------------------------------------------------------------- mutation
    def rename_column(self, old, new):
        if old not in self.columns:
            raise KeyError(old)
        newcols = OrderedDict()
        for n, c in self.columns.items():
            if n == old:
                c.name = new
                newcols[new] = c
            else:
                newcols[n] = c
        self.columns = newcols

    def remove_column(self, name):
        del self.columns[name]

    def remove_columns(self, names):
        for n in names:
            self.remove_column(n)

    def replace_column(self, name, values):
        if name not in self.columns:
            raise KeyError(name)
        col = _coerce_column(values, name=name, length=len(self))
        newcols = OrderedDict()
        for n, c in self.columns.items():
            newcols[n] = col if n == name else c
        self.columns = newcols

    def add_column(self, col, name=None, index=None):
        name = name or getattr(col, "name", None)
        self[name] = col

    def add_row(self, vals, mask=None):
        if len(vals) != len(self.colnames):
            raise ValueError(f"row has {len(vals)} values for "
                             f"{len(self.colnames)} columns")
        if mask is None:
            mask = [False] * len(vals)
        for n, v, m in zip(self.colnames, vals, mask):
            c = self.columns[n]
            if m or v is None or (isinstance(v, float) and np.isnan(v) and c.dtype.kind in "iub"):
                filler = np.zeros(1, dtype=c.dtype) if c.dtype.kind != "O" else np.array([None], object)
                newval = np.ma.MaskedArray(filler, mask=True)
            else:
                newval = np.ma.MaskedArray(np.asarray([v], dtype=c.dtype if c.dtype.kind != "U" else None),
                                           mask=bool(m))
            grown = np.ma.concatenate([c, newval])
            self.columns[n] = Column(grown, name=n, unit=c.unit)

    def sort(self, keys, reverse=False):
        if isinstance(keys, str):
            keys = [keys]
        arrays = []
        for k in reversed(keys):
            c = self.columns[k]
            if c.dtype.kind == "O":
                arrays.append(np.array([_sort_key(v) for v in c], dtype=object))
            else:
                arrays.append(np.ma.filled(c, _sort_fill(c.dtype)))
        order = np.lexsort(arrays) if len(arrays) > 1 else np.argsort(arrays[0], kind="stable")
        if reverse:
            order = order[::-1]
        for n, c in self.columns.items():
            self.columns[n] = Column(c[order], name=n, unit=c.unit)

    def copy(self):
        new = self._new_like()
        for n, c in self.columns.items():
            new.columns[n] = c.copy()
        return new

    # --------------------------------------------------------------- grouping
    def group_by(self, keys):
        if isinstance(keys, str):
            keys = [keys]
        n = len(self)
        rows = list(zip(*[self._key_array(k) for k in keys]))
        order = sorted(range(n), key=lambda i: rows[i])
        grouped = self[np.array(order, dtype=int)] if n else self.copy()
        # find group boundaries
        indices = [0]
        for i in range(1, n):
            if rows[order[i]] != rows[order[i - 1]]:
                indices.append(i)
        indices.append(n)
        keytab = Table()
        for k in keys:
            keytab.columns[k] = Column(grouped[k][np.array(indices[:-1], dtype=int)]
                                       if n else grouped[k], name=k)
        grouped.groups = _Groups(grouped, indices, keytab)
        return grouped

    def _key_array(self, k):
        c = self.columns[k]
        if c.dtype.kind == "O":
            return [_sort_key(v) for v in c]
        return np.ma.filled(c, _sort_fill(c.dtype)).tolist()

    # -------------------------------------------------------------------- I/O
    @classmethod
    def read(cls, filepath, format="ascii", fill_values=None, names=None, **kwargs):
        from . import io as tio
        return tio.read_table(cls, filepath, format=format, fill_values=fill_values, names=names, **kwargs)

    def write(self, filepath, format="ascii", overwrite=False, **kwargs):
        from . import io as tio
        tio.write_table(self, filepath, format=format, overwrite=overwrite, **kwargs)

    def __repr__(self):
        lines = [f"<{self.__class__.__name__} length={len(self)}>"]
        lines.append(" ".join(self.colnames))
        for row in list(self)[:10]:
            lines.append(" ".join(str(v) for v in row))
        if len(self) > 10:
            lines.append("...")
        return "\n".join(lines)


def _sort_fill(dtype):
    if dtype.kind == "f":
        return np.inf
    if dtype.kind in "iu":
        return np.iinfo(dtype).max
    if dtype.kind == "b":
        return True
    if dtype.kind in "US":
        return ""
    return 0


def _sort_key(v):
    # Filter objects sort by their registry order; fall back to str
    order = getattr(type(v), "order", None)
    if order is not None and getattr(v, "name", None) in order:
        return order.index(v.name)
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


def vstack(tables, metadata_conflicts="warn"):
    """Vertically stack tables (union of columns; missing values masked)."""
    tables = [t for t in tables if t is not None]
    if not tables:
        raise ValueError("no tables to stack")
    names = []
    for t in tables:
        for n in t.colnames:
            if n not in names:
                names.append(n)
    out = tables[0]._new_like() if isinstance(tables[0], Table) else Table()
    for n in names:
        pieces = []
        for t in tables:
            if n in t.columns:
                pieces.append(t[n])
            else:
                ref = next(tt[n] for tt in tables if n in tt.columns)
                shape = (len(t),) + ref.shape[1:]
                filler = (np.zeros(shape, dtype=ref.dtype) if ref.dtype.kind != "O"
                          else np.full(shape, None, object))
                pieces.append(np.ma.MaskedArray(filler, mask=True))
        stacked = np.ma.concatenate([np.ma.MaskedArray(p) for p in pieces])
        unit = next((t[n].unit for t in tables if n in t.columns and t[n].unit is not None), None)
        out.columns[n] = Column(stacked, name=n, unit=unit)
    out.meta = dict(tables[0].meta)
    return out
