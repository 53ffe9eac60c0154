"""Minimal time handling: MJD/JD/ISO conversions.

Replaces the subset of ``astropy.time.Time`` that the reference's spectral
calibration module uses (``speccal.py:243-299``): constructing times from MJD,
JD, ISO(T) strings, and decimal-year-free date strings, plus ``.mjd``, ``.jd``,
``.isot``, and day arithmetic.
"""

import datetime as _dt
import re

import numpy as np

__all__ = ["Time"]

_MJD_EPOCH = _dt.datetime(1858, 11, 17, 0, 0, 0)


def _datetime_to_mjd(dt):
    delta = dt - _MJD_EPOCH
    return delta.days + delta.seconds / 86400.0 + delta.microseconds / 86400e6


def _mjd_to_datetime(mjd):
    return _MJD_EPOCH + _dt.timedelta(days=float(mjd))


class Time:
    """A single instant in time, stored internally as MJD (UTC, no leap-second
    accounting — adequate for dating supernova spectra to ~seconds)."""

    def __init__(self, value, format=None):
        if isinstance(value, Time):
            self._mjd = value._mjd
        elif format == "mjd":
            self._mjd = float(value)
        elif format == "jd":
            self._mjd = float(value) - 2400000.5
        elif format == "decimalyear":
            year = int(np.floor(float(value)))
            frac = float(value) - year
            start = _dt.datetime(year, 1, 1)
            length = (_dt.datetime(year + 1, 1, 1) - start).total_seconds()
            self._mjd = _datetime_to_mjd(start + _dt.timedelta(seconds=frac * length))
        elif isinstance(value, (int, float, np.floating, np.integer)) and format is None:
            raise ValueError("numeric Time requires an explicit format ('mjd' or 'jd')")
        elif isinstance(value, _dt.datetime):
            self._mjd = _datetime_to_mjd(value)
        else:
            self._mjd = _datetime_to_mjd(_parse_iso(str(value)))

    @property
    def mjd(self):
        return self._mjd

    @property
    def jd(self):
        return self._mjd + 2400000.5

    @property
    def isot(self):
        return _mjd_to_datetime(self._mjd).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]

    @property
    def iso(self):
        return _mjd_to_datetime(self._mjd).strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]

    def strftime(self, fmt):
        return _mjd_to_datetime(self._mjd).strftime(fmt)

    def __add__(self, other):
        # other: days (float) or a units.Quantity in time units
        days = _as_days(other)
        return Time(self._mjd + days, format="mjd")

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, Time):
            return self._mjd - other._mjd
        return Time(self._mjd - _as_days(other), format="mjd")

    def __lt__(self, other):
        return self._mjd < other._mjd if isinstance(other, Time) else NotImplemented

    def __le__(self, other):
        return self._mjd <= other._mjd if isinstance(other, Time) else NotImplemented

    def __gt__(self, other):
        return self._mjd > other._mjd if isinstance(other, Time) else NotImplemented

    def __ge__(self, other):
        return self._mjd >= other._mjd if isinstance(other, Time) else NotImplemented

    def __eq__(self, other):
        return isinstance(other, Time) and self._mjd == other._mjd

    def __hash__(self):
        return hash(self._mjd)

    def __format__(self, spec):
        return format(self.isot, spec)

    def __repr__(self):
        return f"<Time MJD={self._mjd:.6f} ({self.isot})>"


def _as_days(other):
    from .units import Quantity
    if isinstance(other, Quantity):
        return other.to("d").value
    return float(other)


def _parse_iso(s):
    s = s.strip()
    m = re.match(r"^(\d{4})-?(\d{2})-?(\d{2})([T ](\d{1,2}):(\d{2})(:(\d{2}(\.\d+)?))?)?$", s)
    if not m:
        raise ValueError(f"unrecognized time string: {s!r}")
    year, month, day = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hour = int(m.group(5)) if m.group(5) else 0
    minute = int(m.group(6)) if m.group(6) else 0
    sec = float(m.group(8)) if m.group(8) else 0.0
    return (_dt.datetime(year, month, day, hour, minute)
            + _dt.timedelta(seconds=sec))
