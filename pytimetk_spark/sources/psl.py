"""Bundled Public Suffix List subset for registrable-domain grouping.

The PSL (publicsuffix.org — public, CC0-style licensed data maintained
by Mozilla) is the canonical answer to "which suffix of a host is the
registry boundary": ``example.co.uk`` registers under ``co.uk``, not
``uk``, so domain-level crawl budgets / dedup keys must group by
``example.co.uk``. A last-two-labels approximation under-splits every
ccTLD with second-level registries.

This module bundles a DETERMINISTIC generated subset of the ICANN
section — the high-traffic TLDs plus the second-level registries of
the major ccTLDs, and the PSL's wildcard/exception constructs
(``*.ck`` / ``!www.ck``) so the full rule semantics are exercised.
It is intentionally a subset: deployments that need the complete list
pass their own rules DataFrame to ``url_features(psl_rules=...)`` in
the same ``(rule, n_labels, is_wildcard, is_exception)`` shape —
``psl_rules_from_lines`` parses the official ``public_suffix_list.dat``
format directly.

Scale shape: the rules table is tiny (full PSL ~10k rows), so every
lookup is a BROADCAST hash join against per-host suffix-key columns —
zero shuffles added to the pipeline (webtext/textstats.py:url_features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Generated subset of the ICANN PSL section (publicsuffix.org).
# Plain entries are public suffixes; "*." entries are wildcards (any
# single label matches); "!" entries are exceptions to a wildcard.
_PSL_SUBSET = [
    # generic TLDs
    "com", "net", "org", "edu", "gov", "mil", "int", "info", "biz",
    "io", "co", "ai", "dev", "app", "xyz", "me", "tv", "cc", "ws",
    # country TLDs that allow direct second-level registration
    "de", "fr", "nl", "it", "es", "pl", "se", "no", "fi", "dk", "be",
    "ch", "at", "cz", "gr", "hu", "ie", "pt", "ro", "sk", "us", "ca",
    "eu", "ru", "cn", "jp", "kr", "in", "au", "br", "mx", "ar", "cl",
    "nz", "za", "sg", "hk", "tw", "th", "my", "id", "vn", "ph", "tr",
    "uk", "il", "ae", "sa",
    # United Kingdom second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz", "iwi.nz",
    # Japan
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    # South Korea
    "co.kr", "or.kr", "ne.kr", "go.kr", "re.kr", "pe.kr", "ac.kr",
    "mil.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    # India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    # Mexico / Argentina / Chile
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "gob.cl",
    # Turkey / Taiwan / Hong Kong / Singapore / Malaysia
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "bel.tr", "pol.tr",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    # South Africa / Thailand / Israel / UAE / Saudi Arabia
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.th", "or.th", "in.th", "go.th", "ac.th", "mi.th", "net.th",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "idf.il",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae", "mil.ae",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa",
    # Indonesia / Vietnam / Philippines
    "co.id", "or.id", "net.id", "web.id", "ac.id", "sch.id", "go.id",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
    # PSL wildcard registries + their exceptions (Cook Islands, Eritrea,
    # Falklands — the canonical *.x / !y.x constructs)
    "*.ck", "!www.ck",
    "*.er",
    "*.fk",
    # multi-level registries (exercise 3-label rules)
    "pvt.k12.ma.us", "chtr.k12.ma.us", "paroch.k12.ma.us",
    "act.edu.au", "nsw.edu.au", "qld.edu.au", "vic.edu.au",
]


def psl_rules_from_lines(spark: SparkSession, lines) -> DataFrame:
    """Parse PSL-format lines (the official public_suffix_list.dat
    syntax: comments ``//``, blanks, ``*.`` wildcards, ``!``
    exceptions) into the rules DataFrame ``url_features`` consumes:
    ``(rule, n_labels, is_wildcard, is_exception)``. ``rule`` keeps the
    ``*.`` prefix for wildcards and drops the ``!`` for exceptions
    (match keys are built the same way on the host side); ``n_labels``
    counts all labels including ``*``."""
    rows = []
    for ln in lines:
        s = ln.strip().lower()
        if not s or s.startswith("//"):
            continue
        is_exc = s.startswith("!")
        if is_exc:
            s = s[1:]
        is_wild = s.startswith("*.")
        rows.append((s, s.count(".") + 1, is_wild, is_exc))
    return spark.createDataFrame(
        rows, "rule string, n_labels int, is_wildcard boolean, "
              "is_exception boolean"
    )


def psl_rules(spark: SparkSession) -> DataFrame:
    """The bundled deterministic PSL subset as a rules DataFrame."""
    return psl_rules_from_lines(spark, _PSL_SUBSET)
