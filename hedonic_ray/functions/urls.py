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
    Assumes well-formed absolute urls with a path (scheme://host/...),
    which the crawl-record generator guarantees."""
    s = pc.replace_substring_regex(urls, r"#.*$", "")
    s = pc.replace_substring_regex(s, r"[?&]utm_[^&]*", "")
    # a kept param that followed a stripped one lost its '?'
    s = pc.replace_substring_regex(s, r"^([^?]*?)&", r"\1?")
    parts = pc.split_pattern(s, "/", max_splits=3).combine_chunks()
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
