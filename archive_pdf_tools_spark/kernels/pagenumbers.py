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


# Case-preserving roman <-> alpha reinterpretation partners.
_MATE = {ROMAN_UPPER: ALPHA_UPPER, ROMAN_LOWER: ALPHA_LOWER,
         ALPHA_UPPER: ROMAN_UPPER, ALPHA_LOWER: ROMAN_LOWER}


def _settle(label, peek, ignore_invalid: bool):
    """Resolve one label to ``(kind, numeric, clean)`` given ``peek``,
    the next non-null label in the sequence.

    The look-ahead settles the roman/alpha ambiguity both ways: a
    roman-looking lexeme followed by a same-case letter run ('I' before
    'J') reads as a letter, and a letter lexeme followed by a same-case
    roman run reads as roman.  ``clean`` is False only when the label
    failed strict classification (feeds the caller's all-ok flag).
    """
    try:
        kind = get_val_type(label, ignore_invalid=ignore_invalid)
        num = get_val_value(label, kind)
    except ValueError:
        return INVALID, None, False
    if kind not in _MATE:                       # invalid / arabic: settled
        return kind, num, True

    # The peek is context, not the label under judgement: classify it
    # tolerantly — an unparseable NEIGHBOUR must not crash this label's
    # settlement (it reads as INVALID context instead).
    peek_kind = get_val_type(peek, ignore_invalid=True)
    if kind in (ROMAN_UPPER, ROMAN_LOWER):
        if peek_kind == _MATE[kind]:
            return peek_kind, get_val_value(label, peek_kind), True
        return kind, num, True

    # Alphabetic label: keep it alphabetic when the evidence says so —
    # no successor, consecutive single letters, or an alpha successor.
    if peek is None:
        return kind, num, True
    if len(label) == 1 and len(peek) == 1 and ord(peek) - ord(label) == 1:
        return kind, num, True
    if peek_kind == kind:
        return kind, num, True
    if peek_kind == _MATE[kind]:
        try:    # roman-run reading; fails for roman-invalid lexemes
            return peek_kind, get_val_value(label, peek_kind), True
        except ValueError:
            return INVALID, None, True
    if peek_kind not in (ROMAN_UPPER, ROMAN_LOWER):
        # e.g. a non-roman letter clump followed by arabic pages
        return INVALID, None, True
    # Reference parity: this raise fires even under ignore_invalid
    # (pagenumbers.py:107-110 raises regardless) — parity-tested, so the
    # per-document poison guard lives at the Spark boundary instead.
    raise ValueError("Alpha page numbers are not supported")


def _resolve_labels(labels, ignore_invalid: bool):
    """Phase 1: settle every label to a (kind, numeric) pair.

    The only context a label needs is the next non-null label, which a
    single reverse pass precomputes (O(n) total, vs re-scanning the
    suffix per element)."""
    peeks = [None] * len(labels)
    upcoming = None
    for i in range(len(labels) - 1, -1, -1):
        peeks[i] = upcoming
        if labels[i] is not None:
            upcoming = labels[i]

    resolved = []
    all_ok = True
    for label, peek in zip(labels, peeks):
        kind, num, clean = _settle(label, peek, ignore_invalid)
        all_ok = all_ok and clean
        resolved.append((kind, num))
    return resolved, all_ok


def parse_series(series, ignore_invalid: bool = False):
    """Split a label sequence into maximal consistent runs.

    Two-phase: resolve each label to (kind, numeric) with look-ahead
    disambiguation, then cut the sequence wherever the kind changes or
    the numbering stops incrementing by one (invalid stretches coalesce
    into a single run).  Returns ``(runs, all_ok)`` where each run is a
    dict with start index, kind, and the raw + numeric label slices.

    Semantics match ``internetarchivepdf/pagenumbers.py:147-258``
    (verified against the reference's own hard cases in
    ``tests/test_pagenumbers.py``); the decomposition here is original.
    """
    labels = list(series)
    resolved, all_ok = _resolve_labels(labels, ignore_invalid)

    # Phase 2: cut points.  A cut before i when the kind flips, or when
    # a numbered run skips (consecutive invalids never cut).
    cuts = []
    for i in range(1, len(labels)):
        kind, num = resolved[i]
        prev_kind, prev_num = resolved[i - 1]
        if kind != prev_kind or (kind != INVALID and num != prev_num + 1):
            cuts.append(i)

    starts = [0] + cuts
    ends = cuts + [len(labels)]
    runs = []
    for s, e in zip(starts, ends):
        if e <= s:          # empty input: no runs, not a phantom one
            continue
        runs.append({"start": s,
                     "type": resolved[s][0],
                     "type_human": TYPE_NAMES[resolved[s][0]],
                     "values": labels[s:e],
                     "values_numeric": [num for _k, num in resolved[s:e]]})
    return runs, all_ok
