"""SQL-front-door plans: the Presto-dialect surface driven end-to-end
over the driver corpus (VERDICT r1 #7).

The reference's analysts speak SQL text through
`PrestoConnector.execute_db_query` (ipynb:36-41); our equivalent is
`query.Engine.sql`. tests/test_reference_queries.py replays the
reference's own notebook queries on a reference-shaped fixture — these
plans additionally put the dialect features the reference leans on
(ordinal ORDER BY per ipynb:549, implicit column alias without AS,
`date()` cast-function per ipynb:351) through the DRIVER's oracle gate
on /root/testdata, so the front door has external correctness rows, not
just local parity.

Each plan registers the tables it needs as temp views via
Engine.register (the catalog path, S5) and hands the query TEXT to
Engine.sql — nothing here touches the DataFrame API, which is the
point: text in, verified relation out.

Scale posture: these are ordinary Catalyst plans once parsed — same
broadcast/partial-agg/pushdown properties as their DataFrame twins;
the front door adds zero execution overhead.
"""

from __future__ import annotations

from ..query import Engine
from ..sources.tables import load_table
from . import plan


def _engine(spark, sf_dir, *tables: str) -> Engine:
    eng = Engine(spark)
    for t in tables:
        eng.register(load_table(spark, sf_dir, t), t)
    return eng


# -- ordinal ORDER BY + implicit alias (reference ipynb:549 pattern) -------

_ORDINAL_ORACLE = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY 2 DESC, 1
"""


@plan("sql_ordinal_orderby", _ORDINAL_ORACLE)
def sql_ordinal_orderby(spark, sf_dir):
    """Presto-style `ORDER BY 2 DESC, 1` with an implicit (no-AS) column
    alias, through the SQL text front door (spark.sql.orderByOrdinal
    pinned on by session.RUNTIME_CONFS)."""
    return _engine(spark, sf_dir, "orders").sql(
        """
        SELECT o_orderpriority, count(*) n_orders
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY 2 DESC, 1
        """
    )


# -- date() cast-function on literals (reference ipynb:351 pattern) --------

_DATE_FN_ORACLE = """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= CAST('1995-01-01' AS DATE)
      AND CAST(o_orderdate AS DATE) <  CAST('1996-01-01' AS DATE)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


@plan("sql_date_literal_filter", _DATE_FN_ORACLE)
def sql_date_literal_filter(spark, sf_dir):
    """Presto `date('1995-01-01')` literal casts in a range predicate —
    Spark accepts the same spelling natively; the filter still reaches
    the parquet scan as a pushed predicate."""
    return _engine(spark, sf_dir, "orders").sql(
        """
        SELECT o_orderstatus, count(*) n
        FROM orders
        WHERE date(o_orderdate) >= date('1995-01-01')
          AND date(o_orderdate) <  date('1996-01-01')
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


# -- date(col) on the events timestamp + IN list ---------------------------

_DATE_COL_ORACLE = """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d, COUNT(*) AS n
    FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY 1
    ORDER BY 1
"""


@plan("sql_date_col_groupby", _DATE_COL_ORACLE)
def sql_date_col_groupby(spark, sf_dir):
    """`date(ts)` as both group key and ordinal target over an IN-list
    filter — the reference's daily-rollup SQL shape via text."""
    return _engine(spark, sf_dir, "events").sql(
        """
        SELECT CAST(date(ts) AS STRING) d, count(*) n
        FROM events
        WHERE event_type IN ('click', 'view')
        GROUP BY 1
        ORDER BY 1
        """
    )


# -- join + implicit alias + decimal-exact aggregate + ordinal -------------

_JOIN_ORACLE = """
    SELECT n_name AS nation,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY 2 DESC, 1
    LIMIT 10
"""


@plan("sql_join_implicit_alias", _JOIN_ORACLE)
def sql_join_implicit_alias(spark, sf_dir):
    """Two-table join written as SQL text: implicit aliases, ordinal
    DESC sort with a name tiebreak, LIMIT — the nation dimension still
    broadcasts (Catalyst sees through the text)."""
    return _engine(spark, sf_dir, "customer", "nation").sql(
        """
        SELECT n_name nation,
               cast(sum(cast(c_acctbal as decimal(18,2))) as double) total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY 2 DESC, 1
        LIMIT 10
        """
    )


# -- Presto NULL-ordering default under LIMIT (SURVEY §7.4) ----------------
#
# Presto sorts NULLs LAST by default regardless of direction; Spark
# treats NULL as smallest (ASC -> NULLS FIRST). Under a LIMIT that
# changes WHICH rows survive, so this is a correctness divergence, not
# cosmetics. The front door's translate() rewrites the top-level ORDER
# BY to Presto semantics; this plan drives plain Presto-spelled SQL
# (no explicit NULLS qualifier) through it with a NULL-bearing sort key
# and a LIMIT small enough that the NULL rows MUST be excluded — the
# DuckDB oracle (default_null_order=nulls_last, the Presto convention)
# only hash-matches if the rewrite fired.

_NULL_ORDER_ORACLE = """
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
    FROM customer
    ORDER BY seg, c_custkey
    LIMIT 50
"""


@plan("sql_null_order_limit", _NULL_ORDER_ORACLE)
def sql_null_order_limit(spark, sf_dir):
    """NULL-bearing sort key (every BUILDING customer nulled) under
    ORDER BY + LIMIT with no NULLS qualifier: Presto/DuckDB exclude the
    NULL rows from the top 50, Spark's native default would return
    ONLY NULL rows — parity proves the translate() shim."""
    return _engine(spark, sf_dir, "customer").sql(
        """
        SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') seg
        FROM customer
        ORDER BY seg, c_custkey
        LIMIT 50
        """
    )


# -- scalar subquery in HAVING ---------------------------------------------

_HAVING_ORACLE = """
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n
    FROM per_cust
    WHERE n > (SELECT AVG(n) FROM per_cust)
    ORDER BY n DESC, o_custkey
    LIMIT 20
"""


@plan("sql_having_scalar_subquery", _HAVING_ORACLE)
def sql_having_scalar_subquery(spark, sf_dir):
    """HAVING against a scalar subquery (above-average filter) in SQL
    text — the subquery plans as its own tiny aggregate broadcast into
    the main aggregate's filter."""
    return _engine(spark, sf_dir, "orders").sql(
        """
        SELECT o_custkey, count(*) n
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) > (
          SELECT avg(cnt) FROM (
            SELECT count(*) cnt FROM orders GROUP BY o_custkey
          )
        )
        ORDER BY 2 DESC, 1
        LIMIT 20
        """
    )


# -- Presto function-compat layer through the front door -------------------

_FN_COMPAT_ORACLE = """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(SUM(CASE WHEN strpos(event_type, 'c') > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_c,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           MAX(date_diff('day', CAST(ts AS DATE), DATE '2026-01-01'))
             AS max_days_to_2026,
           CAST(SUM(CASE WHEN isodow(ts) <= 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weekday,
           CAST(SUM(CAST(trunc(value) AS BIGINT)) AS BIGINT) AS value_trunc_sum
    FROM events
    GROUP BY CAST(ts AS DATE)
    ORDER BY day
"""


@plan("sql_presto_fn_compat", _FN_COMPAT_ORACLE)
def sql_presto_fn_compat(spark, sf_dir):
    """The Presto function spellings Spark lacks — strpos,
    json_extract_scalar, 3-arg date_diff, ISO day_of_week, truncate —
    exercised as TEXT through Engine.sql, which installs the SQL-UDF
    compat layer (query.register_presto_compat) and the token rewrites
    (query.translate). The DuckDB oracle states the same semantics in
    DuckDB's own dialect (json_extract_string / isodow / trunc), so the
    row is a genuine cross-engine check of the MAPPING, not a replay."""
    return _engine(spark, sf_dir, "events").sql(
        """
        SELECT CAST(date(ts) AS STRING) AS day,
               SUM(CASE WHEN strpos(event_type, 'c') > 0 THEN 1 ELSE 0 END)
                 AS n_with_c,
               SUM(CAST(json_extract_scalar(props, '$.k') AS BIGINT)) AS k_sum,
               MAX(date_diff('day', date(ts), DATE '2026-01-01'))
                 AS max_days_to_2026,
               SUM(CASE WHEN day_of_week(date(ts)) <= 5 THEN 1 ELSE 0 END)
                 AS n_weekday,
               SUM(CAST(truncate(value) AS BIGINT)) AS value_trunc_sum
        FROM events
        GROUP BY date(ts)
        ORDER BY day
        """
    )


# -- Presto URL functions through the front door ----------------------------

_URL_COMPAT_ORACLE = """
    WITH u AS (
      SELECT doc_id,
             'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' AS host,
             CAST(doc_id % 7 AS VARCHAR) AS k,
             length('/p/' || CAST(doc_id AS VARCHAR)) AS path_len
      FROM documents
    )
    SELECT host, k,
           COUNT(*) AS n,
           CAST(MAX(path_len) AS BIGINT) AS max_path_len
    FROM u
    GROUP BY host, k
    ORDER BY host, k
"""


@plan("sql_presto_url_compat", _URL_COMPAT_ORACLE)
def sql_presto_url_compat(spark, sf_dir):
    """Presto's url_extract_* family as TEXT through Engine.sql — the
    compat layer maps each to Spark's parse_url (catalyst expression,
    zero Python). The query synthesizes a URL per document, extracts
    host / query parameter / path with the Presto spellings, and
    aggregates; the DuckDB oracle restates the expected parts directly
    from the doc_id arithmetic (an independent closed form, so the row
    checks the MAPPING, not a replay)."""
    return _engine(spark, sf_dir, "documents").sql(
        """
        SELECT url_extract_host(u) AS host,
               url_extract_parameter(u, 'k') AS k,
               count(*) AS n,
               CAST(max(length(url_extract_path(u))) AS BIGINT)
                 AS max_path_len
        FROM (
          SELECT 'https://h' || CAST(doc_id % 5 AS STRING)
                 || '.example.com/p/' || CAST(doc_id AS STRING)
                 || '?k=' || CAST(doc_id % 7 AS STRING) AS u
          FROM documents
        )
        GROUP BY 1, 2
        ORDER BY 1, 2
        """
    )


# -- Presto CROSS JOIN UNNEST through the front door ------------------------

_UNNEST_COMPAT_ORACLE = """
    WITH tok AS (
      SELECT unnest(toks) AS term,
             unnest(list_concat(toks[2:], [CAST(NULL AS VARCHAR)])) AS nxt,
             generate_subscripts(toks, 1) AS pos
      FROM (
        SELECT string_split(trim(lower(text)), ' ') AS toks
        FROM documents WHERE length(trim(text)) > 0
      )
    )
    SELECT term,
           COUNT(*) AS n,
           CAST(SUM(pos) AS BIGINT) AS pos_mass,
           CAST(COUNT(nxt) AS BIGINT) AS n_with_next
    FROM tok
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
"""


@plan("sql_presto_unnest_compat", _UNNEST_COMPAT_ORACLE)
def sql_presto_unnest_compat(spark, sf_dir):
    """Presto's lateral UNNEST spellings as TEXT, exercising the FULL
    translate() surface in one query (r5 ask #2): the multi-array zip
    form `UNNEST(a, b)` (positional alignment, shorter side
    NULL-padded) combined with `WITH ORDINALITY` (1-based BIGINT
    index, LAST column — Presto's order). translate() compiles it to
    `LATERAL VIEW inline(transform(zip_with(...)))` — all catalyst
    expressions, whole-stage codegen, no Python in the row path — and
    relocates the view to the end of the FROM clause so trailing joins
    stay parseable (the single-array `AS t(c)` -> explode form is
    pinned by tests/test_sqldoor_dialect.py and the r5 artifact). Term
    frequency + positional mass + bigram-successor counts via the zip
    of the token array with its own tail, oracled against DuckDB's
    aligned multi-unnest + generate_subscripts."""
    return _engine(spark, sf_dir, "documents").sql(
        """
        SELECT t.term AS term,
               count(*) AS n,
               CAST(sum(t.pos) AS BIGINT) AS pos_mass,
               CAST(count(t.nxt) AS BIGINT) AS n_with_next
        FROM documents
        CROSS JOIN UNNEST(
            split(trim(lower(text)), ' '),
            slice(split(trim(lower(text)), ' '), 2,
                  cardinality(split(trim(lower(text)), ' ')))
        ) WITH ORDINALITY AS t(term, nxt, pos)
        WHERE length(trim(text)) > 0
        GROUP BY t.term
        ORDER BY n DESC, term
        LIMIT 20
        """
    )


# -- Presto map_agg / histogram through the front door -----------------------

_MAP_COMPAT_ORACLE = """
    -- grouped like the plan (name AND key: names are unique per
    -- region on any sane corpus, but the oracle must not ASSUME the
    -- 1:1 — r13 null-corpus sweep), and n_nations counts DISTINCT
    -- non-NULL names: that IS the cardinality of a keep-last-deduped
    -- name->key map whose accumulator skips NULL keys
    SELECT r.r_name AS region,
           CAST(MAX(CASE WHEN n.n_name = 'ALGERIA'
                         THEN n.n_nationkey END) AS BIGINT) AS algeria_key,
           CAST(COUNT(DISTINCT n.n_name) AS BIGINT) AS n_nations,
           CAST(COUNT(*) AS BIGINT) AS hist_self
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, r.r_regionkey
    ORDER BY region
"""


@plan("sql_presto_map_compat", _MAP_COMPAT_ORACLE)
def sql_presto_map_compat(spark, sf_dir):
    """Presto's aggregate-map spellings as TEXT: `map_agg(k, v)` and
    `histogram(x)` — aggregates, so the SQL-UDF layer can't host them,
    and their arguments splice into multiple places, so the token
    layer can't either. translate()'s paren-aware call rewriter
    compiles them to map_from_entries over expression-level key-dedup
    (keep-last, so Presto's tolerant duplicate-key semantics hold
    WITHOUT touching the session's mapKeyDedupPolicy) /
    a distinct-transform-filter-count composition (all catalyst). The
    oracle states the same scalars relationally (CASE extraction,
    COUNT) — proving the MAP algebra equals plain aggregation, not
    that two copies of one query agree. Nation keys probed via
    element_at; the self-bucket of a regionkey histogram must equal
    the region's nation count."""
    return _engine(spark, sf_dir, "nation", "region").sql(
        """
        SELECT r.r_name AS region,
               CAST(element_at(map_agg(n.n_name, n.n_nationkey),
                               'ALGERIA') AS BIGINT) AS algeria_key,
               CAST(cardinality(map_agg(n.n_name, n.n_nationkey))
                    AS BIGINT) AS n_nations,
               element_at(histogram(n.n_regionkey),
                          r.r_regionkey) AS hist_self
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, r.r_regionkey
        ORDER BY region
        """
    )


# -- typed single-argument UNNEST (map / array-of-row) -----------------------

_UNNEST_TYPED_ORACLE = """
    SELECT n_regionkey AS rk,
           CAST(COUNT(*) AS BIGINT) AS cnt_map,
           CAST(COUNT(*) AS BIGINT) AS cnt_entries
    FROM nation
    GROUP BY n_regionkey
    ORDER BY rk
"""


@plan("sql_presto_unnest_typed", _UNNEST_TYPED_ORACLE)
def sql_presto_unnest_typed(spark, sf_dir):
    """The last Presto UNNEST spellings through the front door (r6 ask
    #7): single-argument multi-column UNNEST over a MAP (`UNNEST(m) AS
    t(k, v)` -> `explode(m)`) and over an ARRAY(ROW) (`UNNEST(
    map_entries(m)) AS t(k, v)` -> `inline(a)`). The type is pinned by
    the argument's outermost function (map_concat / map_entries here —
    translate()'s disambiguation table); a bare column stays a loud
    NotImplementedError with the workaround in the message. The query
    builds one histogram of nation region keys, expands it BOTH ways
    in one FROM clause, equi-filters the two expansions against each
    other, and the oracle restates the counts relationally — so the
    row proves both expansions agree with plain GROUP BY, not that two
    copies of one rewrite agree."""
    return _engine(spark, sf_dir, "nation").sql(
        """
        SELECT m.rk AS rk,
               CAST(m.cnt AS BIGINT) AS cnt_map,
               CAST(e.cnt2 AS BIGINT) AS cnt_entries
        FROM (SELECT histogram(n_regionkey) AS h FROM nation) s
        CROSS JOIN UNNEST(map_concat(h)) AS m(rk, cnt)
        CROSS JOIN UNNEST(map_entries(h)) AS e(rk2, cnt2)
        WHERE m.rk = e.rk2
        ORDER BY rk
        """
    )
