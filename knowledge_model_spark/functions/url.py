"""URL normalization and domain extraction — pure Column expressions.

Web-crawl corpora key almost everything on the URL: dedup by
normalized URL, quality/blocklist filters by registered domain,
per-domain mixing weights.  These are regexp/string expressions (not
``parse_url``) so the DuckDB oracle can state character-identical
semantics, and so the whole battery runs at scan speed inside
whole-stage codegen.

Normalization (the common crawl-pipeline canon):
- lowercase scheme+host, strip a leading ``www.``
- drop default ports (:80 http, :443 https)
- strip the fragment, strip utm_*/fbclid/gclid tracking params
- collapse a trailing ``?``/``&``, default path ``/``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus userinfo/port), '' if absent."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def url_registered_domain(url: Column) -> Column:
    """Last-two-labels heuristic for the registrable domain
    (``a.b.example.com`` → ``example.com``).  A public-suffix-list
    lookup is the production upgrade; the heuristic is deterministic
    and oracle-identical."""
    host = url_host(url)
    return F.when(
        host.rlike(r"\.[^.]+\."),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(host)


def url_normalize(url: Column) -> Column:
    """Canonical URL for dedup keys (see module docstring)."""
    u = url
    # lowercase scheme and host only: split at the first '/' after '://'
    scheme_host = F.lower(F.regexp_extract(u, r"^([^/?#]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[^/?#]*://[^/?#]*", "")
    u = F.concat(scheme_host, rest)
    u = F.regexp_replace(u, r"^([a-z]+://)www\.", r"$1")
    # default ports — RE2-safe (no lookahead): re-emit the delimiter
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"#.*$", "")
    # tracking params removed outright; if the removed one carried the
    # '?', promote the first surviving '&' back to '?'
    u = F.regexp_replace(u, r"[?&](utm_[a-z0-9]+|fbclid|gclid)=[^&#]*", "")
    u = F.regexp_replace(u, r"^([^?]*)&", r"$1?")
    u = F.regexp_replace(u, r"[?&]$", "")
    # ensure a path: host with nothing after it gets '/'
    u = F.regexp_replace(u, r"^([a-z]+://[^/?#]+)$", r"$1/")
    u = F.regexp_replace(u, r"^([a-z]+://[^/?#]+)\?", r"$1/?")
    return u
