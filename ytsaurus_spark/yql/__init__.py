"""YQL SQL dialect front-end (named expressions, backticked paths, PRAGMA)
— run the reference's own YQL query text on Spark. See dialect.py."""

from __future__ import annotations

from ytsaurus_spark.yql.dialect import (  # noqa: F401
    PRAGMA_CONF_MAP,
    TranslatedQuery,
    apply_pragmas,
    pragma_confs,
    translate_yql,
)
from ytsaurus_spark.yql.tpcds_star import (  # noqa: F401
    STAR_VIEW_SQL,
    oracle_with_star,
    register_star_views,
)


# isolated star sessions, one per (base session, sf_dir): the star views
# are read-only derivations, so yql queries in one process share the
# isolated session instead of rebuilding 24 temp views per call
_STAR_SESSIONS: dict[tuple[int, str], object] = {}


def _star_session(spark, sf_dir: str):
    key = (id(spark.sparkContext), sf_dir)
    s2 = _STAR_SESSIONS.get(key)
    if s2 is None:
        s2 = register_star_views(spark.newSession(), sf_dir)
        _STAR_SESSIONS[key] = s2
    return s2


def yql_select(spark, text: str, sf_dir: str | None = None,
               star: bool = True, pragmas: bool = True):
    """Execute one YQL script and return the result DataFrame.

    Runs in an ISOLATED ``spark.newSession()`` (own temp-view namespace +
    SQL conf) so the star views and any pragma-implied confs never leak
    into the caller's session. ``sf_dir`` registers the fixture tables
    (and, with ``star``, the derived TPC-DS views) first; pass
    ``sf_dir=None`` to run against views the caller already registered.
    Star sessions are cached per (base session, sf_dir).
    """
    tq = translate_yql(text)
    if sf_dir is not None and star:
        s2 = _star_session(spark, sf_dir)
    else:
        s2 = spark.newSession()
        if sf_dir is not None:
            from ytsaurus_spark.catalog import load_tables

            load_tables(s2, sf_dir)
    if pragmas:
        apply_pragmas(s2, tq.pragmas)
    return s2.sql(tq.sql)
