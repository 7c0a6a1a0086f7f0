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
OWNER_PCT_RE = "\\[([0-9]+(?:\\.[0-9]+)?)%\\]"
OWNER_PCT_STRIP_RE = " ?\\[[0-9]+(\\.[0-9]+)?%\\]"


def explode_split(col: Column | str, sep: str = OWNER_SEP) -> Column:
    """``separate_rows(Owner, sep=";\\s*")`` (``GEM/Coalplants_GEM.R:107``)
    → one row per delimited element."""
    return F.explode(F.split(col, sep))


def owner_name(col: Column | str) -> Column:
    """Company name = text before ``[`` (``GEM/Coalplants_GEM.R:110``);
    trimmed as hydro does (``GEM/Hydroplants_GEM.R:167``)."""
    return F.trim(F.regexp_extract(col, OWNER_NAME_RE, 0))


def owner_pct(col: Column | str) -> Column:
    """Ownership fraction from ``[NN%]`` (``GEM/Coalplants_GEM.R:111``,
    lookbehind variant ``GEM/Hydroplants_GEM.R:169``). NULL when the
    cell has no percent — the fallback policy is the kernel's decision
    (SURVEY §2.10)."""
    pct = F.regexp_extract(col, OWNER_PCT_RE, 1)
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
