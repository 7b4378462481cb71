"""URL canonicalization — the url-level dedup a web pipeline runs
BEFORE content dedup: the same page is crawled as `http://Example.com`,
`https://example.com/?utm_source=x`, `https://example.com:443/#frag`,
and exact text dedup misses the duplication whenever the bodies differ
by a timestamp or ad slot.  (The reference's analog is normalizing the
decoded payload to one canonical representation before any analysis —
samples to [-1.0, 1.0] at decode, decoder.rs:19 — so every downstream
comparison sees one spelling per input.)

Rules (standard RFC 3986 normalization + tracking-param hygiene), all
pure Catalyst string expressions so a DuckDB oracle can apply the SAME
regex logic and the driver can value-match the query end-to-end:

  1. drop the fragment (`#...` never reaches the server)
  2. lowercase the scheme and the host (case-insensitive by spec)
  3. strip the scheme's default port (`:80` http, `:443` https)
  4. drop tracking query params (utm_*, gclid, fbclid, ref, mc_cid,
     mc_eid) and SORT the survivors (param order is not semantic)
  5. empty path -> `/`

Deliberately NOT done (semantics-changing): trailing-slash collapse,
index.html stripping, percent-decoding — those can alias distinct
resources and belong in site-specific config.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref|mc_cid|mc_eid)="


def canonical_url_col(url_col: str = "url") -> Column:
    """Canonical form of an absolute http(s) URL, NULL for anything that
    does not parse as one."""
    u = F.col(url_col)
    no_frag = F.regexp_replace(u, r"#.*", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "")
                & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return F.when(
        (scheme.isin("http", "https")) & (hostport != ""), canon
    )


def url_dup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical_url, n_variants, variants): groups of DISTINCT raw
    urls that collapse to one canonical form — the url-level dup report
    (n_variants > 1 only).  One hash-groupBy on the canonical string;
    at corpus scale this is the cheap pre-pass that shrinks the content
    dedup's input."""
    return (
        df.select(canonical_url_col(url_col).alias("canonical_url"),
                  F.col(url_col).alias("raw"))
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count_distinct("raw").alias("n_variants"),
            F.sort_array(F.collect_set("raw")).alias("variants"),
        )
        .where(F.col("n_variants") > 1)
    )
