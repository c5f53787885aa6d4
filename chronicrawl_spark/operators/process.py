"""Post-fetch processing: robots/sitemap/page dispatch → discoveries.

Mirrors ``Exchange.process()`` (``Exchange.java:166-224``): only successful
(2xx), non-revisit exchanges are processed; dispatch on location type:
ROBOTS → robots parse (sitemaps enqueued as SITEMAP, origin robots fields
updated), SITEMAP → entries enqueued (+ sitemap_entries upsert), PAGE →
HTML/CSS analysis (resources → TRANSCLUSION, links → PAGE).

Implemented as one ``mapInPandas`` over the success rows (Arrow-batched;
one Python crossing per partition) yielding a tall "discovery" frame that
the engine splits and merges declaratively.  Parse failures yield nothing —
in the reference a processing exception flips only the in-memory status
*after* the visit row was already written (``Exchange.java:79-92,184-187``),
so stored state is unaffected.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..sources import content as C

DISCOVERY_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # loc | sm_entry | robots
        T.StructField("url", T.StringType(), True),
        T.StructField("loc_type", T.StringType(), True),
        T.StructField("changefreq", T.StringType(), True),
        T.StructField("priority", T.FloatType(), True),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("crawl_delay", T.IntegerType(), True),
        T.StructField("robots_txt", T.BinaryType(), True),
        T.StructField("via_origin_id", T.LongType(), True),
        T.StructField("via_path_id", T.LongType(), True),
        T.StructField("via_depth", T.IntegerType(), True),
        T.StructField("via_url", T.StringType(), True),
        T.StructField("sm_origin_id", T.LongType(), True),
        T.StructField("sm_path_id", T.LongType(), True),
    ]
)

_IN_COLS = ["origin_id", "path_id", "url", "location_type", "depth", "content_type", "body", "loc_header"]


def _process_row(row: dict, user_agent: str, max_robots_bytes: int):
    url = row["url"]
    base = dict(
        changefreq=None, priority=None, lastmod=None, crawl_delay=None, robots_txt=None,
        via_origin_id=row["origin_id"], via_path_id=row["path_id"],
        via_depth=int(row["depth"]), via_url=url, sm_origin_id=None, sm_path_id=None,
    )
    ltype = row["location_type"]
    body = row["body"]
    try:
        if ltype == "ROBOTS":
            raw = bytes(body or b"")[:max_robots_bytes]
            rules = C.parse_robots(raw, user_agent)
            yield {**base, "kind": "robots", "url": None, "loc_type": None,
                   "crawl_delay": rules.crawl_delay, "robots_txt": raw}
            for sm in rules.sitemaps:
                from ..functions.urlkit import resolve

                yield {**base, "kind": "loc", "url": resolve(url, sm), "loc_type": "SITEMAP"}
        elif ltype == "SITEMAP":
            from ..functions.urlkit import resolve

            for e in C.parse_sitemap(bytes(body or b"")):
                target = resolve(url, e.loc)
                yield {**base, "kind": "loc", "url": target, "loc_type": e.type}
                yield {**base, "kind": "sm_entry", "url": target, "loc_type": None,
                       "changefreq": e.changefreq, "priority": e.priority, "lastmod": e.lastmod,
                       "sm_origin_id": row["origin_id"], "sm_path_id": row["path_id"]}
        elif ltype == "PAGE":
            res = C.analyze_payload(row["content_type"], bytes(body or b""), url, row["loc_header"])
            for u, _rtype in res.resources:
                yield {**base, "kind": "loc", "url": u, "loc_type": "TRANSCLUSION"}
            for u in res.links:
                yield {**base, "kind": "loc", "url": u, "loc_type": "PAGE"}
        # TRANSCLUSION: no case in the reference switch → no processing
    except Exception:
        return  # parse failure: stored state unaffected (Exchange.java:184-187)


def process_success_rows(
    success: DataFrame, user_agent: str, max_robots_bytes: int = 512 * 1024
) -> DataFrame:
    """success-rows DataFrame → discovery rows (see module doc)."""

    def mapper(batches):
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                for d in _process_row(row, user_agent, max_robots_bytes):
                    out.append(d)
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in DISCOVERY_SCHEMA.fields])

    return success.select(*_IN_COLS).mapInPandas(mapper, DISCOVERY_SCHEMA)
