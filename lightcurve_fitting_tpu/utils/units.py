"""Minimal unit system.

The reference package uses astropy units in two ways: (1) LaTeX-formatted axis
labels for model parameters (``models.py:15-39,314-320``) and (2) a handful of
physical conversions. Astropy is not a dependency here, so this module provides a
small unit algebra with ``latex_inline`` formatting compatible with the strings the
reference produces, plus dimensional conversions for the cases the framework needs
(wavelength units in speccal, time/length scalings).

All device-side physics uses fixed internal conventions (kK, 1000 R_sun, THz, W/Hz —
see ``lightcurve_fitting_tpu.core.constants``); units here are host-side metadata.
"""

import numpy as np

__all__ = ["Unit", "Quantity", "def_unit", "dimensionless_unscaled"]

# atom -> (dimension vector dict, SI scale, latex string)
_ATOMS = {
    "m": ({"L": 1}, 1.0, "m"),
    "cm": ({"L": 1}, 1e-2, "cm"),
    "km": ({"L": 1}, 1e3, "km"),
    "nm": ({"L": 1}, 1e-9, "nm"),
    "um": ({"L": 1}, 1e-6, "\\mu m"),
    "Angstrom": ({"L": 1}, 1e-10, "\\mathring{A}"),
    "pc": ({"L": 1}, 3.0856775814913673e16, "pc"),
    "Mpc": ({"L": 1}, 3.0856775814913673e22, "Mpc"),
    "Rsun": ({"L": 1}, 6.957e8, "R_{\\odot}"),
    "s": ({"T": 1}, 1.0, "s"),
    "h": ({"T": 1}, 3600.0, "h"),
    "d": ({"T": 1}, 86400.0, "d"),
    "yr": ({"T": 1}, 31557600.0, "yr"),
    "kg": ({"M": 1}, 1.0, "kg"),
    "g": ({"M": 1}, 1e-3, "g"),
    "Msun": ({"M": 1}, 1.98840987e30, "M_{\\odot}"),
    "K": ({"K": 1}, 1.0, "K"),
    "kK": ({"K": 1}, 1e3, "kK"),
    "Hz": ({"T": -1}, 1.0, "Hz"),
    "THz": ({"T": -1}, 1e12, "THz"),
    "W": ({"M": 1, "L": 2, "T": -3}, 1.0, "W"),
    "erg": ({"M": 1, "L": 2, "T": -2}, 1e-7, "erg"),
    "eV": ({"M": 1, "L": 2, "T": -2}, 1.602176634e-19, "eV"),
    "J": ({"M": 1, "L": 2, "T": -2}, 1.0, "J"),
    "mag": ({"mag": 1}, 1.0, "mag"),
    "deg": ({"ang": 1}, np.pi / 180.0, "{}^{\\circ}"),
    "rad": ({"ang": 1}, 1.0, "rad"),
}

_ALIASES = {
    "angstrom": "Angstrom", "A": "Angstrom", "AA": "Angstrom",
    "angstroms": "Angstrom", "Angstroms": "Angstrom",
    "micron": "um", "Micron": "um",
    "day": "d", "M_sun": "Msun", "solMass": "Msun", "R_sun": "Rsun", "solRad": "Rsun",
}


def _canon(name):
    return _ALIASES.get(name, name)


class Unit:
    """A product of named unit atoms raised to rational powers, with a scale."""

    # ndarray <op> Unit must dispatch to OUR reflected ops (one array-valued
    # Quantity), not numpy's elementwise broadcasting over an object scalar
    # (which yields an object ndarray of per-element Quantities)
    __array_priority__ = 10000

    def __init__(self, powers=None, scale=1.0, latex=None, name=None):
        self.powers = dict(powers or {})
        self.scale = float(scale)
        self._latex = latex  # override for def_unit
        self.name = name

    # -------------------------------------------------------------- algebra
    def _combine(self, other, sign):
        other = Unit.parse(other)
        powers = dict(self.powers)
        for a, p in other.powers.items():
            powers[a] = powers.get(a, 0) + sign * p
            if powers[a] == 0:
                del powers[a]
        scale = self.scale * (other.scale if sign > 0 else 1.0 / other.scale)
        return Unit(powers, scale)

    def __mul__(self, other):
        if isinstance(other, (int, float, np.floating, np.ndarray)):
            return Quantity(other, self)
        if isinstance(other, Quantity):
            return Quantity(other.value, self * other.unit)
        return self._combine(other, +1)

    def __rmul__(self, other):
        if isinstance(other, (int, float, np.floating, np.ndarray)):
            return Quantity(other, self)
        if isinstance(other, Quantity):
            return Quantity(other.value, other.unit * self)
        return Unit.parse(other)._combine(self, +1)

    def __truediv__(self, other):
        if isinstance(other, Quantity):
            return Quantity(1.0 / other.value, self / other.unit)
        if isinstance(other, (int, float, np.floating, np.ndarray)):
            return Quantity(1.0 / np.asarray(other, float), self)
        return self._combine(other, -1)

    def __rtruediv__(self, other):
        if isinstance(other, (int, float, np.floating, np.ndarray)):
            inv = Unit({a: -p for a, p in self.powers.items()}, 1.0 / self.scale)
            # bare 1/unit is the astropy idiom for the inverse UNIT;
            # anything else (incl. arrays) is a Quantity
            if np.ndim(other) == 0 and other == 1:
                return inv
            return Quantity(other, inv)
        return Unit.parse(other)._combine(self, -1)

    def __pow__(self, n):
        return Unit({a: p * n for a, p in self.powers.items()}, self.scale ** n)

    def __eq__(self, other):
        if not isinstance(other, Unit):
            return NotImplemented
        return self.powers == other.powers and np.isclose(self.scale, other.scale)

    def __hash__(self):
        return hash((tuple(sorted(self.powers.items())), round(np.log10(self.scale) if self.scale > 0 else 0, 9)))

    # ----------------------------------------------------------- dimensions
    def dimension(self):
        dims = {}
        for a, p in self.powers.items():
            for d, dp in _ATOMS[a][0].items():
                dims[d] = dims.get(d, 0) + dp * p
                if dims[d] == 0:
                    del dims[d]
        return dims

    def si_scale(self):
        scale = self.scale
        for a, p in self.powers.items():
            scale *= _ATOMS[a][1] ** p
        return scale

    def to(self, other):
        """Conversion factor from this unit to ``other``."""
        other = Unit.parse(other)
        if self.dimension() != other.dimension():
            raise ValueError(f"incompatible units: {self} -> {other}")
        return self.si_scale() / other.si_scale()

    # ----------------------------------------------------------- formatting
    @staticmethod
    def parse(obj):
        if isinstance(obj, Unit):
            return obj
        if isinstance(obj, str):
            return _parse_string(obj)
        raise TypeError(f"cannot interpret {obj!r} as a unit")

    def _latex_body(self):
        if self._latex is not None:
            return self._latex
        if not self.powers:
            return ""
        parts = []
        for a, p in sorted(self.powers.items(), key=lambda kv: -kv[1]):
            tex = _ATOMS[a][2]
            if p == 1:
                parts.append(tex)
            elif p == int(p):
                parts.append(f"{tex}^{{{int(p)}}}")
            else:
                parts.append(f"{tex}^{{{p:g}}}")
        return "\\,".join(parts)

    def to_string(self, fmt=None):
        if fmt in ("latex_inline", "latex"):
            body = self._latex_body()
            return f"$\\mathrm{{{body}}}$" if body else ""
        if not self.powers:
            return ""
        return " ".join(f"{a}{'' if p == 1 else int(p) if p == int(p) else p}"
                        for a, p in sorted(self.powers.items(), key=lambda kv: -kv[1]))

    def __format__(self, spec):
        if spec in ("latex_inline", "latex"):
            return self.to_string(spec)
        return self.to_string()

    def __str__(self):
        return self.to_string()

    def __repr__(self):
        return f"Unit(\"{self.to_string()}\")"


def _parse_string(s):
    s = s.strip()
    if s in ("", "1", "dimensionless"):
        return dimensionless_unscaled
    # handle things like 'erg / (Angstrom cm2 s)' and 'W / (Hz m2)'
    s = s.replace("**", "")
    if "/" in s:
        num, _, den = s.partition("/")
        den = den.strip().strip("()")
        unit = _parse_product(num)
        for tok in den.split():
            unit = unit / _parse_atom(tok)
        return unit
    return _parse_product(s)


def _parse_product(s):
    unit = Unit()
    for tok in s.replace("*", " ").split():
        unit = unit * _parse_atom(tok)
    return unit


def _parse_atom(tok):
    tok = tok.strip()
    m = None
    for i in range(len(tok), 0, -1):
        base = tok[:i]
        if _canon(base) in _ATOMS:
            m = (_canon(base), tok[i:])
            break
    if m is None:
        raise ValueError(f"unknown unit {tok!r}")
    name, powstr = m
    power = 1.0
    if powstr:
        powstr = powstr.lstrip("^")
        power = float(powstr)
    return Unit({name: power})


class Quantity:
    """A value with a unit. Only what the host layer needs."""

    # see Unit.__array_priority__: ndarray <op> Quantity must come here,
    # not decay to a plain ndarray via __array__
    __array_priority__ = 10000

    def __init__(self, value, unit=None):
        if isinstance(value, Quantity):
            unit = value.unit if unit is None else unit
            value = value.value
        self.value = np.asarray(value) if not np.isscalar(value) else value
        self.unit = Unit.parse(unit) if unit is not None else dimensionless_unscaled

    def to(self, other):
        other = Unit.parse(other)
        return Quantity(self.value * self.unit.to(other), other)

    def __mul__(self, other):
        if isinstance(other, Unit):
            return Quantity(self.value, self.unit * other)
        if isinstance(other, Quantity):
            return Quantity(self.value * other.value, self.unit * other.unit)
        return Quantity(self.value * other, self.unit)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, Unit):
            return Quantity(self.value, self.unit / other)
        if isinstance(other, Quantity):
            return Quantity(self.value / other.value, self.unit / other.unit)
        return Quantity(self.value / other, self.unit)

    def __rtruediv__(self, other):
        return Quantity(other / self.value, self.unit ** -1)

    def __pow__(self, n):
        return Quantity(self.value ** n, self.unit ** n)

    def __array__(self, dtype=None):
        return np.asarray(self.value, dtype=dtype)

    def __float__(self):
        return float(self.value)

    def __format__(self, spec):
        if spec in ("latex_inline", "latex"):
            return f"{self.value:g} {self.unit:latex_inline}"
        return f"{self.value} {self.unit}"

    def __repr__(self):
        return f"<Quantity {self.value} {self.unit}>"


def def_unit(name, represents=None, format=None):
    """Define a named unit, optionally in terms of an existing quantity.

    Mirrors ``astropy.units.def_unit`` for the single use in the reference
    (``models.py:662``: M_chandra = 1.4 Msun with a custom latex string)."""
    latex = (format or {}).get("latex", name)
    if isinstance(represents, Quantity):
        base = represents.unit
        scale = represents.value
        unit = Unit(base.powers, base.scale * scale, latex=latex, name=name)
    elif isinstance(represents, Unit):
        unit = Unit(represents.powers, represents.scale, latex=latex, name=name)
    else:
        unit = Unit({}, 1.0, latex=latex, name=name)
    return unit


dimensionless_unscaled = Unit({}, 1.0)

# module-level singletons, astropy-style access: u.cm, u.Msun, ...
for _name in _ATOMS:
    globals()[_name] = Unit({_name: 1})
angstrom = globals()["Angstrom"]
micron = globals()["um"]
