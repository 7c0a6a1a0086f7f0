"""String / regex scalar operators (SURVEY §2.8).

All built-in ``pyspark.sql.functions`` — JVM-side, codegen'd, never
Python UDFs. Java regex supports the reference's lookarounds directly
(``GEM/Hydroplants_GEM.R:169`` uses ``(?<=\\[)\\d+(?=%\\])``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Owner-cell grammar (real sample, coal tracker:
# "IG Power (Callide) Ltd [50%]; CS Energy Ltd [50%]").
OWNER_SEP = ";\\s*"
OWNER_NAME_RE = "^[^\\[]+"
# The engine's documented grammar: bracketed percent, decimals allowed.
OWNER_PCT_RE = "\\[([0-9]+(?:\\.[0-9]+)?)%\\]"
# Reference-parity grammars (they differ per script — see owner_pct):
#   coal/gasoil `str_extract(Owner, "\\d+(?=%)")` ≡ first match of
#   digits immediately before '%', bracket-agnostic; on a decimal like
#   "[12.5%]" it matches "5" (→0.05), and it accepts a bare "50%".
OWNER_PCT_REF_COAL_RE = "([0-9]+)%"
#   hydro-family `(?<=\\[)\\d+(?=%\\])` ≡ integer-only bracketed; a
#   decimal "[12.5%]" does NOT match → NULL → equal-share fallback.
OWNER_PCT_REF_HYDRO_RE = "\\[([0-9]+)%\\]"
OWNER_PCT_STRIP_RE = " ?\\[[0-9]+(\\.[0-9]+)?%\\]"


def explode_split(col: Column | str, sep: str = OWNER_SEP) -> Column:
    """``separate_rows(Owner, sep=";\\s*")`` (``GEM/Coalplants_GEM.R:107``)
    → one row per delimited element."""
    return F.explode(F.split(col, sep))


def owner_name(col: Column | str) -> Column:
    """Company name = text before ``[`` (``GEM/Coalplants_GEM.R:110``);
    trimmed as hydro does (``GEM/Hydroplants_GEM.R:167``).

    Documented divergence: the coal/gasoil scripts do NOT trim, so in
    the reference ``"A Corp [50%]"`` yields ``"A Corp "`` (trailing
    space) while a bracket-less ``"A Corp"`` yields ``"A Corp"`` — the
    same company then splits into two groups at aggregation. The
    engine always trims (one group), which is the behavior the
    reference's own hydro script chose."""
    return F.trim(F.regexp_extract(col, OWNER_NAME_RE, 0))


_PCT_GRAMMARS = {
    "bracketed": OWNER_PCT_RE,
    "ref_coal": OWNER_PCT_REF_COAL_RE,
    "ref_hydro": OWNER_PCT_REF_HYDRO_RE,
}


def owner_pct(col: Column | str, grammar: str = "bracketed") -> Column:
    """Ownership fraction from the owner cell. NULL when the cell has
    no percent — the fallback policy is the kernel's decision
    (SURVEY §2.10).

    Grammars (documented divergence — the reference scripts disagree
    with each other on malformed cells):

    * ``"bracketed"`` (engine default): ``[NN%]`` or ``[NN.N%]`` —
      decimals allowed, bracket required. Sane superset for new data.
    * ``"ref_coal"`` — exact ``GEM/Coalplants_GEM.R:111`` /
      ``GasOilplants_GEM.R:139`` semantics (``str_extract(Owner,
      "\\d+(?=%)")``): first run of digits immediately before ``%``,
      brackets ignored; ``"[12.5%]"`` → 0.05, bare ``"50%"`` → 0.5.
    * ``"ref_hydro"`` — exact ``GEM/Hydroplants_GEM.R:169``
      (``(?<=\\[)\\d+(?=%\\])``): integer-only AND bracketed;
      ``"[12.5%]"`` → NULL → equal-share fallback.

    All three agree on well-formed integer cells like ``"[40%]"``.
    """
    pct = F.regexp_extract(col, _PCT_GRAMMARS[grammar], 1)
    return F.when(pct != "", pct.cast("double") / 100.0)


def strip_pct_suffix(col: Column | str) -> Column:
    """Remove `` [NN.N%]`` decoration (``GEM/Hydroplants_GEM.R:201-202``)."""
    return F.regexp_replace(col, OWNER_PCT_STRIP_RE, "")


def concat_coords(lat: Column | str, lon: Column | str) -> Column:
    """``paste0(lat, ", ", lon)`` (``GEM/Coalplants_GEM.R:182``)."""
    return F.concat_ws(", ", lat, lon)


def surrogate_id_format(n: Column | str) -> Column:
    """``paste0("TFL", sprintf("%08d", n))`` (``GEM/TotalData_GEM.R:25``)."""
    return F.format_string("TFL%08d", F.col(n) if isinstance(n, str) else n)
