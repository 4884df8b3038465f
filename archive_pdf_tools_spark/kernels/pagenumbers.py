"""Page-number series parsing (run-length sessionization).

Re-derives ``internetarchivepdf/pagenumbers.py:47-258``: classify each page
label (arabic / roman upper+lower / alpha upper+lower / invalid), use
look-ahead to the next non-null label to disambiguate roman-vs-alpha
('I', 'II' before 'III' vs before 'C'), and split the sequence into runs
whenever the type changes or the numeric value is not prev+1.

The roman-numeral validator/parser replaces the external ``roman`` package
with the same classic pattern/values (M{0,4}(CM|CD|D?C{0,3})… — the public
Dive-Into-Python grammar the package implements); empty strings are
invalid.

Quirks preserved:

* ``get_val_value`` strips at the first space ('VII A.' → 'VII') —
  ``pagenumbers.py:125-126``.
* The alpha look-ahead compares ``ord()`` of the *whole* label and treats
  any multi-char label as a TypeError → both ords None
  (``pagenumbers.py:188-194``).
* ``alpha_to_number`` is the Evince-style folding ('A'=1, 'AA'=27,
  'AB'=27 — yes, really: ``pagenumbers.py:81-99``).
"""

from __future__ import annotations

import re

__all__ = ["INVALID", "ARABIC", "ROMAN_LOWER", "ROMAN_UPPER", "ALPHA_UPPER",
           "ALPHA_LOWER", "TYPE_NAMES", "parse_series", "get_val_type",
           "get_val_value", "alpha_to_number", "roman_to_int", "is_roman"]

INVALID, ARABIC, ROMAN_LOWER, ROMAN_UPPER, ALPHA_UPPER, ALPHA_LOWER = range(6)

TYPE_NAMES = {
    INVALID: "Invalid",
    ARABIC: "Arabic",
    ROMAN_LOWER: "Roman lower",
    ROMAN_UPPER: "Roman upper",
    ALPHA_UPPER: "Alpha upper",
    ALPHA_LOWER: "Alpha lower",
}

_ARABIC_RE = re.compile(r"^[0-9]+$")
_ALPHA_UPPER_RE = re.compile(r"^[A-Z]+$")
_ALPHA_LOWER_RE = re.compile(r"^[a-z]+$")
# The classic strict roman grammar (allows up to MMMM, like the `roman` pkg).
_ROMAN_RE = re.compile(r"^M{0,4}(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})(IX|IV|V?I{0,3})$")
_ROMAN_VALUES = (("M", 1000), ("CM", 900), ("D", 500), ("CD", 400),
                 ("C", 100), ("XC", 90), ("L", 50), ("XL", 40),
                 ("X", 10), ("IX", 9), ("V", 5), ("IV", 4), ("I", 1))


def is_roman(n: str) -> bool:
    if not n:
        return False
    return _ROMAN_RE.match(n.upper()) is not None


def roman_to_int(n: str) -> int:
    if not is_roman(n):
        raise ValueError("Invalid roman numeral: %r" % n)
    s = n.upper()
    i, total = 0, 0
    for sym, val in _ROMAN_VALUES:
        while s.startswith(sym, i):
            total += val
            i += len(sym)
    return total


def is_arabic(n):
    return _ARABIC_RE.match(n) is not None and n.isnumeric()


def alpha_to_number(n: str) -> int:
    """Evince-style: 'A'=1 … 'Z'=26, 'AA'=27 (``pagenumbers.py:81-99``)."""
    first = True
    res = 1
    for ch in n:
        tmp = ord(ch) - ord("A")
        res += tmp
        if first:
            first = False
        else:
            res += 26 - tmp
    return res


def get_val_type(v, ignore_invalid: bool = False) -> int:
    if v is None:
        return INVALID
    elif is_arabic(v):
        return ARABIC
    elif v.lower() == v and is_roman(v):
        return ROMAN_LOWER
    elif v.upper() == v and is_roman(v):
        return ROMAN_UPPER
    elif _ALPHA_UPPER_RE.match(v):
        return ALPHA_UPPER
    elif _ALPHA_LOWER_RE.match(v):
        return ALPHA_LOWER
    else:
        if ignore_invalid:
            return INVALID
        raise ValueError("Page number not in spec: %r" % v)


def get_val_value(v, vtype):
    if v and " " in v:
        v = v.strip().split(" ")[0]
    if vtype == INVALID:
        return None
    elif vtype == ARABIC:
        return int(v, 10)
    elif vtype in (ROMAN_LOWER, ROMAN_UPPER):
        try:
            return roman_to_int(v)
        except ValueError:
            raise ValueError
    elif vtype in (ALPHA_LOWER, ALPHA_UPPER):
        return alpha_to_number(v.upper())


def _find_next_nonzero(series, start):
    for v in series[start:]:
        if v is not None:
            return v
    return None


def parse_series(series, ignore_invalid: bool = False):
    """Split a label sequence into runs; returns (list of run dicts,
    all_ok).  Direct semantics of ``pagenumbers.py:147-258``."""
    last_value = None
    last_val_type = INVALID
    series_start = 0
    resulting_series = []
    all_ok = True
    running_series = []
    running_series_n = []

    for idx, val in enumerate(series):
        new = False
        try:
            val_type = get_val_type(val, ignore_invalid=ignore_invalid)
            val_value = get_val_value(val, val_type)
        except ValueError:
            all_ok = False
            val_type = INVALID
            val_value = None

        if val_type in (ROMAN_UPPER, ROMAN_LOWER):
            next_val = _find_next_nonzero(series, idx + 1)
            next_val_type = get_val_type(next_val, ignore_invalid=ignore_invalid)
            if val_type != next_val_type:
                if (val_type == ROMAN_UPPER and next_val_type == ALPHA_UPPER) or \
                        (val_type == ROMAN_LOWER and next_val_type == ALPHA_LOWER):
                    val_type = next_val_type
                    val_value = get_val_value(val, val_type)

        if val_type in (ALPHA_UPPER, ALPHA_LOWER):
            next_val = _find_next_nonzero(series, idx + 1)
            next_val_type = get_val_type(next_val, ignore_invalid=ignore_invalid)
            try:
                # ord() raises TypeError on None *and* on multi-char strings.
                ord_val = ord(val)
                ord_next_val = ord(next_val)
            except TypeError:
                ord_val = None
                ord_next_val = None

            if next_val is None:
                pass
            elif ord_val is not None and ord_next_val is not None and \
                    ord_val == ord_next_val - 1:
                pass
            elif val_type == next_val_type:
                pass
            elif (val_type == ALPHA_UPPER and next_val_type == ROMAN_UPPER) or \
                 (val_type == ALPHA_LOWER and next_val_type == ROMAN_LOWER):
                try:
                    val_type = next_val_type
                    val_value = get_val_value(val, val_type)
                except ValueError:
                    val_type = INVALID
                    val_value = None
            elif val_type in (ALPHA_LOWER, ALPHA_UPPER) and \
                    next_val_type not in (ROMAN_UPPER, ROMAN_LOWER):
                # e.g. invalid roman ('XXXVIIII') followed by arabic
                # (pagenumbers.py:211-216)
                val_type = INVALID
                val_value = None
            else:
                raise ValueError("Alpha page numbers are not supported")

        if val_type != last_val_type:
            new = True
        if val_type == INVALID and last_val_type == INVALID:
            pass
        else:
            if last_val_type == INVALID:
                new = True
            elif val_type == INVALID:
                new = True
            elif val_value != last_value + 1:
                new = True

        if new and idx != 0:
            resulting_series.append({"start": series_start,
                                     "type": last_val_type,
                                     "type_human": TYPE_NAMES[last_val_type],
                                     "values": running_series,
                                     "values_numeric": running_series_n})
            series_start = idx
            running_series = []
            running_series_n = []

        running_series.append(val)
        running_series_n.append(val_value)
        last_value = val_value
        last_val_type = val_type

    resulting_series.append({"start": series_start,
                             "type": last_val_type,
                             "type_human": TYPE_NAMES[last_val_type],
                             "values": running_series,
                             "values_numeric": running_series_n})
    return resulting_series, all_ok
