"""graph-node BigDecimal parse + normalization (behavioral port of ref
stablehash/big_decimal.go, itself a port of graph-node's scalar.rs).

Purpose is *hashing parity only*, not arithmetic: parse a decimal string the
way graph-node does, producing the exact (int, scale) pair it would hash —
including its quirks, all pinned by the reference's 50+ golden vectors
(big_decimal_test.go:11-113):

- at most 34 significant digits; the cut rounds toward +infinity
  (round-up for positive, truncate for negative)
- the digit counter under-counts negative values by design (its probe loop
  compares signed), so negatives keep 35 digits — bug replicated on purpose
- trailing zeros stripped with the scale adjusted; zero normalizes to
  scale 0
"""

from __future__ import annotations

from dataclasses import dataclass

MAX_SIGNIFICANT_DIGITS = 34
_LOG2_10 = 3.3219280949


class BigDecimalParseError(ValueError):
    pass


def _parse_int_base0(s: str) -> int:
    """Go strconv.ParseInt(s, 0, 64) semantics: 0x/0o/0b prefixes, legacy
    leading-0 octal, optional underscores."""
    raw = s.strip()
    neg = False
    if raw.startswith(("+", "-")):
        neg = raw[0] == "-"
        raw = raw[1:]
    raw = raw.replace("_", "")
    if not raw:
        raise BigDecimalParseError(f"invalid exponent value {s!r}")
    try:
        if raw.lower().startswith(("0x", "0o", "0b")):
            v = int(raw, 0)
        elif raw.startswith("0") and len(raw) > 1:
            v = int(raw, 8)  # Go base-0 treats leading 0 as octal
        else:
            v = int(raw, 10)
    except ValueError as exc:
        raise BigDecimalParseError(f"invalid exponent value {s!r}") from exc
    return -v if neg else v


def _trunc_divmod(a: int, p: int) -> tuple[int, int]:
    """Go big.Int QuoRem: truncated (toward-zero) division, remainder takes
    the dividend's sign — unlike Python's floored divmod."""
    q = abs(a) // p
    if a < 0:
        q = -q
    return q, a - q * p


def _ten_to_the(pow_: int) -> int:
    return 10 ** pow_


def _digits(v: int) -> int:
    """Digit count with the reference's float-guess + probe loop
    (big_decimal.go digits()).  The probe compares *signed*, so negative
    values never take the +1 branch — the deliberate negative-number quirk."""
    if v == 0:
        return 1
    bits = abs(v).bit_length()
    digits = int(bits / _LOG2_10)
    num = _ten_to_the(digits)
    while v >= num:  # signed compare on purpose
        num *= 10
        digits += 1
    return digits


def _trailing_zero_bits(v: int) -> int:
    if v == 0:
        return 0
    return (v & -v).bit_length() - 1


def _rounding_term(num: int) -> int:
    """0 or 1 depending on whether the cut remainder rounds up
    (big_decimal.go get_rounding_term — note the bits-minus-trailing-zeros
    oddity, kept for parity)."""
    if num == 0:
        return 0
    bits = abs(num).bit_length() - _trailing_zero_bits(abs(num))
    digits = int(bits / _LOG2_10)
    n = _ten_to_the(digits)
    while True:
        if num < n:
            return 1
        n *= 5
        if num < n:
            return 0
        n *= 2


@dataclass
class BigDecimal:
    int_val: int
    scale: int

    # alias mirroring reference naming
    @property
    def Int(self) -> int:
        return self.int_val

    @classmethod
    def from_string(cls, s: str) -> "BigDecimal":
        base_part, exponent_value = s, 0
        loc = -1
        for i, ch in enumerate(s):
            if ch in "eE":
                loc = i
                break
        if loc != -1:
            base, exp_raw = s[:loc], s[loc + 1 :]
            if exp_raw.startswith("+"):
                exp_raw = exp_raw[1:]
            exponent_value = _parse_int_base0(exp_raw)
            base_part = base

        if base_part == "":
            raise BigDecimalParseError("failed to parse empty string")

        digits, decimal_offset = base_part, 0
        # NOTE: the reference searches '.' in the FULL string but slices
        # base_part (big_decimal.go:62) — replicated, including the implied
        # failure if the dot sits past the exponent marker.
        dot = s.find(".")
        if dot != -1:
            if dot > len(base_part):
                raise BigDecimalParseError(f"invalid decimal {s!r}")
            lead, trail = base_part[:dot], base_part[dot + 1 :]
            digits = lead + trail
            decimal_offset = len(trail)

        scale = decimal_offset - exponent_value
        try:
            int_val = int(digits, 10)
        except ValueError as exc:
            raise BigDecimalParseError(f"invalid digits part {digits!r}") from exc

        out = cls(int_val=int_val, scale=scale)
        out._normalize()
        return out

    def _normalize(self) -> None:
        if self.int_val == 0:
            self.scale = 0
            return

        self._with_precision(MAX_SIGNIFICANT_DIGITS)

        sign = -1 if self.int_val < 0 else 1
        digits = str(abs(self.int_val))
        stripped = digits.rstrip("0")
        trailing = len(digits) - len(stripped)
        self.int_val = sign * int(stripped)
        self.scale = self.scale - trailing

    def _with_precision(self, prec: int) -> None:
        digits = _digits(self.int_val)
        if digits > prec:
            diff = digits - prec
            p = _ten_to_the(diff)
            q, r = _trunc_divmod(self.int_val, p)
            if p < 10 * r:  # positive remainder only can round up
                q += _rounding_term(r)
            self.int_val = q
            self.scale -= diff
        elif digits < prec:
            diff = prec - digits
            self.int_val *= _ten_to_the(diff)
            self.scale += diff
