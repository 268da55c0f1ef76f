"""URL canonicalization — the crawl-dedup front door.

Web crawls see the same resource under many spellings: case-mangled
scheme/host, explicit default ports, fragments, tracking parameters.
Canonicalization collapses them BEFORE any content-level dedup runs,
so it sits first in every crawl pipeline (the reference's pipelines
key everything on raw page url — `hedonic/...` has no normalizer; this
is a target-capability addition like the dedup family).

Rules (the conservative, lossless subset every normalizer agrees on):

1. strip the fragment (``#...`` — never sent to the server);
2. drop ``utm_*`` tracking parameters, preserving the order of the
   rest (and re-pointing the first surviving separator back to ``?``);
3. lowercase the SCHEME and HOST only — paths and query values are
   case-sensitive and preserved;
4. strip the explicit default port ``:443``.

Everything is a chain of Arrow compute kernels (regex replaces +
one bounded split/rejoin) — zero Python per row; the identical chain
is expressed in the SQL oracle with ``regexp_replace``/``lower``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def canonicalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized canonical form of each url (see module rules).
    Assumes well-formed absolute urls with a path (scheme://host/...)
    and no literal '?' inside query values, which the crawl-record
    generator guarantees.  utm stripping is SCOPED TO THE QUERY
    STRING (split at the first '?'), so a path segment containing
    '&utm_' is never touched (review finding: the earlier
    whole-string regex could swallow path bytes)."""
    s = pc.replace_substring_regex(urls, r"#.*$", "")
    # split path / query at the first '?' (append one so every row
    # has a query slot; strip it back off the tail)
    def _split(arr, sep, n):
        out = pc.split_pattern(arr, sep, max_splits=n)
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) \
            else out

    padded = pc.binary_join_element_wise(s, "", "?")
    pq = _split(padded, "?", 1)
    path = pc.list_element(pq, 0)
    q = pc.replace_substring_regex(pc.list_element(pq, 1), r"\?$", "")
    q = pc.replace_substring_regex(q, r"(^|&)utm_[^&]*", "")
    q = pc.replace_substring_regex(q, r"^&", "")
    s = pc.if_else(pc.equal(q, ""), path,
                   pc.binary_join_element_wise(path, q, "?"))
    parts = _split(s, "/", 3)
    scheme = pc.utf8_lower(pc.list_element(parts, 0))
    host = pc.utf8_lower(pc.list_element(parts, 2))
    host = pc.replace_substring_regex(host, r":443$", "")
    rest = pc.list_element(parts, 3)
    return pc.binary_join_element_wise(scheme, "", host, rest, "/")


def crawl_records(batch: pa.Table, key: str = "doc_id") -> pa.Table:
    """Deterministic messy crawl-record variants of each document's
    canonical url (the fixture's urls are already clean, so raw urls
    would make every rule vacuous — FIXTURES.md discipline: derive the
    mess arithmetically from ``doc_id`` and let the SQL oracle derive
    the identical mess):

    - r0: case-mangled scheme+host;
    - r1: explicit :443 port + two utm_* params (doc_id-dependent);
    - r2 (even ids): fragment;
    - r3 (ids ≡ 0 mod 3): kept ``ref=`` param (case preserved) after
      a stripped utm param;
    - r4 (ids ≡ 0 mod 5): exact repeat of r0 (so records > variants).
    """
    ids = batch.column(key).to_numpy()
    z = np.char.zfill(ids.astype("U20"), 8)
    out_id, out_url = [], []

    def emit(mask: np.ndarray, urls: np.ndarray) -> None:
        out_id.append(ids[mask])
        out_url.append(urls[mask])

    all_m = np.ones(len(ids), bool)
    r0 = np.char.add("HTTPS://DOCS.EXAMPLE/", z)
    emit(all_m, r0)
    r1 = np.char.add(
        np.char.add("https://docs.example:443/", z),
        np.char.add("?utm_source=feed&utm_campaign=c",
                    (ids % 7).astype("U2")))
    emit(all_m, r1)
    r2 = np.char.add(np.char.add("https://docs.example/", z),
                     np.char.add("#sec", (ids % 5).astype("U2")))
    emit(ids % 2 == 0, r2)
    r3 = np.char.add(np.char.add("https://docs.example/", z),
                     np.char.add(np.char.add("?ref=AB",
                                             (ids % 4).astype("U2")),
                                 "&utm_medium=em"))
    emit(ids % 3 == 0, r3)
    emit(ids % 5 == 0, r0)
    return pa.table({key: pa.array(np.concatenate(out_id)),
                     "url": pa.array(np.concatenate(out_url).astype(object),
                                     pa.string())})
